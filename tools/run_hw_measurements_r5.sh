#!/bin/bash
# Round-5 hardware measurement sweep (run when the axon tunnel is up).
#
# Converts the round-4 verdict's evidence debt into artifacts:
#   1. superleaf fused 8-bit Adam update vs roofline (VERDICT #1) —
#      r4 shipped 16.98 ms = 4.57x roofline (per-leaf kernel launches +
#      pad copies); target: beat the 6.4 ms bf16-mu path it replaces.
#   2. clean B=16 MFU: 8-bit OFF, each remat policy (VERDICT #3) —
#      the only r4 B=16 run had the slow optimizer polluting it.
#   3. B=16/B=8 with the NEW 8-bit path (capacity story, now that the
#      update is supposed to pay for itself).
#   4. headline bench with the extended extras (build time + IVF1M
#      serving qps — BASELINE.md rows 2-3, VERDICT #5).
#
# ADVICE r4 fixes vs run_hw_measurements_r4.sh: non-zero rc now writes an
# explicit FAILED/TIMEOUT marker to sweep.log, and the tunnel sanity
# check re-runs between steps, aborting the sweep (with an ABORTED
# marker) if the tunnel died — partial sweeps are self-describing.
#
# Sequential on purpose: one chip, one CPU core.
# Usage: bash tools/run_hw_measurements_r5.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-artifacts/hw_sweep_r5_$(date +%m%d_%H%M)}
mkdir -p "$LOG"

tunnel_ok() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('tunnel ok', float((x@x).sum()), jax.devices())" >>"$LOG/tunnel.log" 2>&1
}

run() {
  name=$1; shift
  if ! tunnel_ok; then
    echo "!!! ABORTED before $name: tunnel down ($(date +%H:%M:%S))" \
      | tee -a "$LOG/sweep.log"
    exit 1
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG/sweep.log"
  timeout 1800 "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/sweep.log"
  if [ $rc -eq 124 ]; then
    echo "!!! $name TIMEOUT (1800s)" | tee -a "$LOG/sweep.log"
  elif [ $rc -ne 0 ]; then
    echo "!!! $name FAILED rc=$rc" | tee -a "$LOG/sweep.log"
  else
    echo "--- $name ok rc=0" | tee -a "$LOG/sweep.log"
  fi
}

# 1. superleaf fused 8-bit update vs roofline (and the unaligned-leaf
#    case that exposed the r4 pad-copy overhead)
run opt python tools/bench_opt_update.py --save

# 2. clean B=16 MFU, 8-bit OFF: no-remat control + the capacity-friendly
#    remat policy (VERDICT #3 asks for the policy sweep)
run mfu_b16_clean python tools/bench_train_mfu.py --batch 16 --save
run mfu_b16_remat python tools/bench_train_mfu.py --batch 16 \
  --remat dots_with_no_batch_dims_saveable --save

# 3. B=16 and B=8 with the new superleaf 8-bit path
run mfu_b16_8bit python tools/bench_train_mfu.py --batch 16 --adam8bit --save
run mfu_b8_8bit python tools/bench_train_mfu.py --batch 8 --adam8bit --save

# 4. headline bench with BASELINE rows 2-3 extras
run headline python bench.py

echo "sweep done ($(date +%H:%M:%S)); logs in $LOG" | tee -a "$LOG/sweep.log"
