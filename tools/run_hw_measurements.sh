#!/bin/bash
# One-shot hardware measurement sweep (run when the axon tunnel is up).
#
# Re-measures everything whose kernels changed in round 3 (merged flash
# backwards, sub-128 fused windows) and appends to artifacts/*.jsonl via
# each tool's --save. Sequential on purpose: one chip, one CPU core.
#
# Usage: bash tools/run_hw_measurements.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-artifacts/hw_sweep_$(date +%m%d_%H%M)}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG/sweep.log"
  timeout 1800 "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/sweep.log"
  echo "--- $name rc=$rc" | tee -a "$LOG/sweep.log"
}

# 0. sanity: tunnel serves a matmul
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('tunnel ok', float((x@x).sum()), jax.devices())" || {
  echo "tunnel down — aborting"; exit 1; }

# 1. kernel parity on real hardware (merged backwards vs XLA composite)
run parity python tools/check_kernel_parity_tpu.py

# 2. train-step MFU at the production shapes (+16k encoder)
run mfu_b2 python tools/bench_train_mfu.py --batch 2 --save
run mfu_b4 python tools/bench_train_mfu.py --batch 4 --save
run mfu_b8 python tools/bench_train_mfu.py --batch 8 --save
run mfu_enc16k python tools/bench_train_mfu.py --batch 1 --enc16k --save

# 3. per-phase breakdown (where did the merged bwd land?)
run phases python tools/bench_train_phases.py --save

# 4. serving
run serving_b1 python tools/bench_serving_e2e.py --batch 1 --save
run decode_b1 python tools/bench_decode.py --batch 1
run decode_b2 python tools/bench_decode.py --batch 2
# bench_decode has no --save: append its JSON line (last line of the log)
for d in decode_b1 decode_b2; do
  tail -1 "$LOG/$d.log" | grep '^{' >> artifacts/decode_bench.jsonl || true
done

# 5. optimizer-phase roofline dissection (new tool, never run on hw)
run opt python tools/bench_opt_update.py --save

# 6. headline bench
run headline python bench.py

echo "sweep done ($(date +%H:%M:%S)); logs in $LOG" | tee -a "$LOG/sweep.log"
