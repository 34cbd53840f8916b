#!/bin/bash
# End-of-round-5 sweep: commit after EACH stage so partial progress lands
# even if wall-clock runs out. One TPU client at a time
# (memory/axon-tpu-bench-gotchas). Headline bench.py is skipped here —
# the driver runs it itself for BENCH_r05.json.
set -u
LOG=${1:-/tmp/r5_final}
mkdir -p "$LOG"
cd /root/repo

echo "== tunnel check"
if ! timeout 300 python bench_probe.py 2; then
    echo "TPU unavailable - aborting"; exit 1
fi

echo "== 1/2 bench_all (fused Restormer rows)"
timeout 2700 python bench_all.py > "$LOG/bench_all.log" 2>&1
if [ $? -eq 0 ]; then
    python tools/update_perf_docs.py || true
    git add BENCH_ALL.json README.md run/tunnel_log.jsonl 2>/dev/null
    git commit -m "BENCH_ALL refresh: fused Restormer serving path measured on chip" \
        -- BENCH_ALL.json README.md run/tunnel_log.jsonl 2>&1 | tail -1
    echo "STAGE1_COMMITTED"
else
    echo "bench_all failed/timeout"
fi
grep metric "$LOG/bench_all.log" || true

echo "== 2/2 bench_train (remat rows)"
timeout 2700 python bench_train.py > "$LOG/bench_train.log" 2>&1
if [ $? -eq 0 ]; then
    python tools/update_perf_docs.py || true
    git add BENCH_TRAIN.json README.md run/tunnel_log.jsonl 2>/dev/null
    git commit -m "BENCH_TRAIN refresh: NAFBlock remat rows measured on chip" \
        -- BENCH_TRAIN.json README.md run/tunnel_log.jsonl 2>&1 | tail -1
    echo "STAGE2_COMMITTED"
else
    echo "bench_train failed/timeout"
fi
grep metric "$LOG/bench_train.log" || true
echo "== done"
