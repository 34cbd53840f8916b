#!/bin/bash
# Round-5 measurement sweep: run when the TPU tunnel is healthy.
# One TPU client at a time (memory/axon-tpu-bench-gotchas); each stage
# bounded and logged. Usage: bash run/r5_bench_sweep.sh [logdir]
#
# Perf-record policy: no perf claim lands in README/PERF.md without the
# committed artifact this script refreshes (BENCH_ALL.json /
# BENCH_TRAIN.json). This script COMMITS the fresh artifacts itself
# (pathspec-scoped commit, so it cannot sweep up unrelated staged work).
set -u
LOG=${1:-/tmp/r5_sweep}
mkdir -p "$LOG"
cd /root/repo

echo "== tunnel check (fail-fast probe)"
if ! timeout 300 python bench_probe.py 2; then
    echo "TPU unavailable - aborting"; exit 1
fi

echo "== 1/4 bench_all (writes BENCH_ALL.json incl. restormer mf row)"
timeout 7200 python bench_all.py > "$LOG/bench_all.log" 2>&1
RC_ALL=$?
grep metric "$LOG/bench_all.log" || true

echo "== 2/4 bench_train (writes BENCH_TRAIN.json incl. bf16 + fused rows)"
timeout 7200 python bench_train.py > "$LOG/bench_train.log" 2>&1
RC_TRAIN=$?
grep metric "$LOG/bench_train.log" || true

echo "== 3/4 headline bench.py"
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1 || true
grep metric "$LOG/bench.log" || true

echo "== 4/4 commit fresh artifacts + regenerated README tables (pathspec-scoped)"
if [ $RC_ALL -eq 0 ] || [ $RC_TRAIN -eq 0 ]; then
    cp "$LOG/bench.log" run/r5_bench_headline.log 2>/dev/null || true
    python tools/update_perf_docs.py || true
    # git add first: `git commit -- <untracked>` fails the whole commit on
    # a pathspec error (bit the 02:06 window this round)
    git add BENCH_ALL.json BENCH_TRAIN.json README.md run/tunnel_log.jsonl \
        run/r5_bench_headline.log 2>/dev/null
    git commit -m "Fresh TPU perf artifacts from self-armed r5 sweep (+ README tables)" \
        -- BENCH_ALL.json BENCH_TRAIN.json README.md run/tunnel_log.jsonl \
           run/r5_bench_headline.log 2>&1 | tail -2
    echo "SWEEP_COMMITTED"
else
    echo "both bench stages failed - not committing"; exit 1
fi

echo "== done; logs in $LOG"
