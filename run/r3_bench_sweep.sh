#!/bin/bash
# Round-3 final measurement sweep: run when the TPU tunnel is healthy.
# One TPU client at a time (memory/axon-tpu-bench-gotchas); each stage
# bounded and logged. Usage: bash run/r3_bench_sweep.sh [logdir]
set -u
LOG=${1:-/tmp/r3_sweep}
mkdir -p "$LOG"
cd /root/repo

echo "== tunnel check"
if [ "$(ss -tln | grep -cE ':80[89][0-9]|:81[01][0-9]')" = "0" ]; then
    echo "tunnel DOWN - aborting"; exit 1
fi

echo "== 1/4 dwconv crossover probe (bf16)"
timeout 1800 python run/probe_lowering.py dw bf16 > "$LOG/probe_dw.log" 2>&1
tail -n +2 "$LOG/probe_dw.log" | grep -v WARNING

echo "== 2/4 bench_all (writes BENCH_ALL.json)"
timeout 5400 python bench_all.py > "$LOG/bench_all.log" 2>&1
grep metric "$LOG/bench_all.log"

echo "== 3/4 bench_train (writes BENCH_TRAIN.json)"
timeout 5400 python bench_train.py > "$LOG/bench_train.log" 2>&1
grep metric "$LOG/bench_train.log"

echo "== 4/4 headline bench.py"
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1
grep metric "$LOG/bench.log"

echo "== done; logs in $LOG"
