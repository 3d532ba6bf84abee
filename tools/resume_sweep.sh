#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/hw_sweep_r3final
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG/sweep.log"
  timeout 1800 "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/sweep.log"
  echo "--- $name rc=$rc" | tee -a "$LOG/sweep.log"
}
run mfu_b4 python tools/bench_train_mfu.py --batch 4 --save
run mfu_b8 python tools/bench_train_mfu.py --batch 8 --save
run mfu_enc16k python tools/bench_train_mfu.py --batch 1 --enc16k --save
run phases python tools/bench_train_phases.py --save
run serving_b1 python tools/bench_serving_e2e.py --batch 1 --save
run decode_b1 python tools/bench_decode.py --batch 1
run decode_b2 python tools/bench_decode.py --batch 2
for d in decode_b1 decode_b2; do
  tail -1 "$LOG/$d.log" | grep '^{' >> artifacts/decode_bench.jsonl || true
done
run opt python tools/bench_opt_update.py --save
run headline python bench.py
echo "sweep done ($(date +%H:%M:%S)); logs in $LOG" | tee -a "$LOG/sweep.log"
