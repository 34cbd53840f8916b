#!/bin/bash
# Round-4 measurement sweep: run when the TPU tunnel is healthy.
# One TPU client at a time (memory/axon-tpu-bench-gotchas); each stage
# bounded and logged. Usage: bash run/r4_bench_sweep.sh [logdir]
#
# Perf-record policy (r4): no perf claim lands in README/PERF.md without
# the committed artifact this script refreshes (BENCH_ALL.json /
# BENCH_TRAIN.json). After a successful sweep, update README.md's
# benchmark table from the fresh JSONs and commit them together.
set -u
LOG=${1:-/tmp/r4_sweep}
mkdir -p "$LOG"
cd /root/repo

echo "== tunnel check (fail-fast probe)"
if ! timeout 300 python bench_probe.py 2; then
    echo "TPU unavailable - aborting"; exit 1
fi

echo "== 1/5 dwconv crossover probe (bf16)"
timeout 1800 python run/probe_lowering.py dw bf16 > "$LOG/probe_dw.log" 2>&1
tail -n +2 "$LOG/probe_dw.log" | grep -v WARNING

echo "== 2/5 bench_all (writes BENCH_ALL.json)"
timeout 5400 python bench_all.py > "$LOG/bench_all.log" 2>&1
grep metric "$LOG/bench_all.log"

echo "== 3/5 bench_train (writes BENCH_TRAIN.json incl. bf16 + fused rows)"
timeout 5400 python bench_train.py > "$LOG/bench_train.log" 2>&1
grep metric "$LOG/bench_train.log"

echo "== 4/5 restormer multi-frame tile batching (writes into BENCH_ALL)"
timeout 3600 python bench_all.py --only restormer_1080p_tiled256_bf16_mf \
    > "$LOG/bench_restormer_mf.log" 2>&1 || true
grep metric "$LOG/bench_restormer_mf.log" || true

echo "== 5/5 headline bench.py"
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1
grep metric "$LOG/bench.log"

echo "== done; logs in $LOG"
echo "REMINDER: update README.md benchmark rows from the fresh artifacts."
