#!/usr/bin/env bash
# Canonical train invocation (reference run.sh:3-9 equivalent).
# Debug knobs: JAX_TRACEBACK_FILTERING=off for full stacks (the
# TORCH_SHOW_CPP_STACKTRACES analog); JAX_LOG_COMPILES=1 to surface
# recompilation (the CUDA_LAUNCH_BLOCKING-era debugging story is moot —
# XLA programs are compiled ahead of dispatch).
set -euo pipefail
export JAX_TRACEBACK_FILTERING=${JAX_TRACEBACK_FILTERING:-off}
export JAX_LOG_COMPILES=${JAX_LOG_COMPILES:-0}
export TOKENIZERS_PARALLELISM=false

exec python -u -m retrieval_augmented_mds_tpu.cli fit \
    --config "${1:-configs/smoke.yaml}"
