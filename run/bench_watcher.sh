#!/bin/bash
# Self-arming bench watcher (VERDICT r4 task 1).
#
# Polls the axon tunnel every POLL_S seconds with the cheap port check
# (no TPU client spawn — a dead tunnel makes backend init hang, see
# bench_probe.py). On the FIRST healthy window it runs the full r5 sweep,
# which commits BENCH_ALL.json + BENCH_TRAIN.json itself, then keeps
# logging polls so the round has a complete availability record either way.
# Every poll appends one JSON line to run/tunnel_log.jsonl.
set -u
cd /root/repo
POLL_S=${1:-240}
LOGJ=run/tunnel_log.jsonl
SWEPT=0

while true; do
    TS=$(date +%s)
    ISO=$(date -Is)
    PORTS=$(python -c "from bench_probe import tunnel_ports_open; print(tunnel_ports_open())" 2>/dev/null || echo 0)
    if [ "$PORTS" -gt 0 ] && [ "$SWEPT" -eq 0 ]; then
        echo "{\"ts\": $TS, \"iso\": \"$ISO\", \"tunnel_ports\": $PORTS, \"note\": \"healthy - firing r5 sweep\"}" >> "$LOGJ"
        if bash run/r5_bench_sweep.sh /tmp/r5_sweep >> run/r5_sweep_console.log 2>&1; then
            SWEPT=1
            echo "{\"ts\": $(date +%s), \"iso\": \"$(date -Is)\", \"note\": \"sweep completed and committed\"}" >> "$LOGJ"
        else
            echo "{\"ts\": $(date +%s), \"iso\": \"$(date -Is)\", \"note\": \"sweep attempt failed; will retry next healthy poll\"}" >> "$LOGJ"
        fi
    else
        echo "{\"ts\": $TS, \"iso\": \"$ISO\", \"tunnel_ports\": $PORTS, \"swept\": $SWEPT}" >> "$LOGJ"
    fi
    sleep "$POLL_S"
done
