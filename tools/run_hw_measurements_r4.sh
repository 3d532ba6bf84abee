#!/bin/bash
# Round-4 hardware measurement sweep (run when the axon tunnel is up).
#
# Measures everything the round-3 verdict asked for on real hardware:
#   1. fused 8-bit Adam update (ops/adam8bit_update.py) vs roofline —
#      the XLA path measured 3.76x; target <=1.3x (~3.7 ms @ 162M).
#   2. B=16 train-step MFU with 8-bit state + fused update (the freed
#      ~1.6 GB HBM should convert to MFU; target >=35%).
#   3. serving e2e with the DMA serving kernel now in the ivf_search
#      route (index/ivf.py serving-shape gate).
#   4. headline bench.
#
# Sequential on purpose: one chip, one CPU core.
# Usage: bash tools/run_hw_measurements_r4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-artifacts/hw_sweep_r4_$(date +%m%d_%H%M)}
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

# 1. fused 8-bit roofline dissection (hardware parity already recorded
#    in artifacts/adam8bit_hw_parity.json)
run opt python tools/bench_opt_update.py --save

# 2. B=16 (and B=8 control) MFU with fused 8-bit state
run mfu_b16_8bit python tools/bench_train_mfu.py --batch 16 --adam8bit --save
run mfu_b8_8bit python tools/bench_train_mfu.py --batch 8 --adam8bit --save

# 3. serving e2e with the DMA kernel in the route
run serving_b1 python tools/bench_serving_e2e.py --batch 1 --save

# 4. headline bench
run headline python bench.py

echo "sweep done ($(date +%H:%M:%S)); logs in $LOG" | tee -a "$LOG/sweep.log"
