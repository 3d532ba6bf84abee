"""Fused Pallas kernel for the blockwise 8-bit AdamW update.

Why a kernel at all: the optimizer update is a zero-FLOP, pure
HBM-bandwidth op, and the XLA lowering of train/adam8bit.py measured
**3.76x the HBM roofline** (13.95 ms vs 3.71 ms at 162M params,
artifacts/opt_update_bench.jsonl). The per-128-block quantizer needs two
row reductions (absmax for mu, min/max-of-log2 for nu) whose results
feed elementwise consumers *of the same inputs*; XLA resolves that by
duplicating the dequant+EMA computation into several fusions, each of
which re-reads the moment/grad streams from HBM. The whole update is a
single streaming pass over the state, so the fix is to write it as one:
each grid step loads a [R, 128] tile of every stream into VMEM, does
dequant -> EMA -> step -> requant entirely on-chip, and writes the
update plus the re-quantized state back exactly once.

Traffic per param (f32 grads/params, wd=0): g 4r + upd 4w + mu 1r1w +
nu 1r1w + scales 12/128 r/w ~= 12.2 B — below the bf16-mu XLA path's 20 B
even before counting that path's fusion-duplication overhead. The params
stream is only materialized when weight decay is active (wd != 0 adds
p 4r -> ~16.2 B/param); at wd == 0 the kernel takes no params operand.

Semantics match the train/adam8bit.py XLA composite expression-for-
expression (same block layout, same quantizer math in the same
association order, same jnp.round half-to-even) — parity-tested in
tests/test_adam8bit.py both in interpret mode and, via
tools/run_hw_measurements.sh, on hardware. Exact bitwise equality is not
guaranteed across backends (XLA may fuse/reassociate the composite
differently), so the parity test pins a tight float tolerance instead.
The composite remains the correctness oracle, the CPU path, and the path
under RAMDS_FORCE_XLA_OPS=1.

Reference context: the upstream reaches for DeepSpeedCPUAdam + ZeRO
offload to afford Adam state (sotasum/lightning_model.py:16,
pretrain.py:605-614); the TPU-native answer is 8-bit state in HBM with
the update running at the memory roofline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 128  # quantizer block == lane width (train/adam8bit.py BLOCK)

# Leaves below this many elements stay on the XLA composite: their
# traffic is negligible and per-kernel launch overhead would dominate.
MIN_FUSED_SIZE = 16384


def fused_enabled(interpret: bool | None = None) -> bool:
    """Kernel gate: TPU backend (or explicit interpret), not forced off.
    RAMDS_FUSED_OPT=1 forces the kernel on (interpret mode off-TPU) —
    used by the integration tests on the CPU mesh."""
    if os.environ.get("RAMDS_FORCE_XLA_OPS", "") == "1":
        return False
    if interpret or os.environ.get("RAMDS_FUSED_OPT", "") == "1":
        return True
    return jax.default_backend() == "tpu"


def _kernel(scal_ref, g_ref, mq_ref, ms_ref, nq_ref, nlo_ref, nhi_ref,
            *refs, n, tile_rows, b1, b2, eps, wd, tiny, log_tiny, log_range):
    # params stream exists only when weight decay is active — at wd == 0
    # the kernel reads exactly the grad/state streams (12.2 B/param).
    if wd:
        p_ref, upd_ref, mq2_ref, ms2_ref, nq2_ref, nlo2_ref, nhi2_ref = refs
    else:
        upd_ref, mq2_ref, ms2_ref, nq2_ref, nlo2_ref, nhi2_ref = refs
    bc1 = scal_ref[0, 0]
    bc2 = scal_ref[0, 1]
    lr = scal_ref[0, 2]

    g = g_ref[...].astype(jnp.float32)
    # dequant + EMA — the exact expressions of adam8bit.dequantize_mu/_nu,
    # in the same association order (q/255*rng, NOT q*(rng/255)): fp
    # rounding differs between the two, and the parity test pins this.
    # Narrow-int casts go through int32: Mosaic has no direct
    # {u,}int8 <-> f32 lowering (the int32 hop is exact for 8-bit values).
    mq_f = mq_ref[...].astype(jnp.int32).astype(jnp.float32)
    mu = b1 * (mq_f * ms_ref[...]) + (1.0 - b1) * g
    rng0 = jnp.maximum(nhi_ref[...] - nlo_ref[...], 1e-6)
    nq_f = nq_ref[...].astype(jnp.int32).astype(jnp.float32)
    nu_prev = jnp.exp2(nlo_ref[...] + nq_f / 255.0 * rng0)
    nu = b2 * nu_prev + (1.0 - b2) * g * g

    step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    if wd:
        step = step + wd * p_ref[...].astype(jnp.float32)
    upd_ref[...] = (-lr * step).astype(upd_ref.dtype)

    # validity mask for the tail block (pad elements must not steer the
    # per-block scales — same rule as adam8bit._valid_mask). scal[0,3] is
    # a global row offset: 0 single-device; shard_index * rows_per_shard
    # when the update runs per-shard under shard_map (ZeRO composition,
    # train/adam8bit.py). Offsets are block-row counts (< 2^24 for any
    # realistic leaf), so the f32 slot holds them exactly.
    i = pl.program_id(0)
    off = scal_ref[0, 3].astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, BLOCK), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, BLOCK), 1)
    idx = (off + i * tile_rows + row) * BLOCK + lane
    mask = idx < n

    # requant mu: symmetric linear int8 per block
    absmax = jnp.max(jnp.abs(jnp.where(mask, mu, 0.0)), axis=1, keepdims=True)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    mq2_ref[...] = (
        jnp.clip(jnp.round(mu / safe), -127, 127)
        .astype(jnp.int32).astype(jnp.int8)
    )
    ms2_ref[...] = scale

    # requant nu: affine-in-log2 uint8 per block
    log = jnp.log2(jnp.maximum(nu, tiny))
    log = jnp.where(mask, log, log_tiny)
    hi = jnp.max(jnp.where(mask, log, -jnp.inf), axis=1, keepdims=True)
    hi = jnp.maximum(hi, log_tiny)
    lo = jnp.min(jnp.where(mask, log, jnp.inf), axis=1, keepdims=True)
    lo = jnp.clip(lo, hi - log_range, hi)
    rng1 = jnp.maximum(hi - lo, 1e-6)
    q = jnp.round(jnp.clip((log - lo) / rng1, 0.0, 1.0) * 255.0)
    nq2_ref[...] = q.astype(jnp.int32).astype(jnp.uint8)
    nlo2_ref[...] = lo
    nhi2_ref[...] = hi


@functools.partial(
    jax.jit,
    static_argnames=("n", "b1", "b2", "eps", "wd", "out_dtype",
                     "tile_rows", "interpret", "tiny", "log_tiny",
                     "log_range"),
)
def adam8bit_leaf_update(
    g2, mq, ms, nq, nlo, nhi, p2, scal, *,
    n: int,
    b1: float,
    b2: float,
    eps: float,
    wd: float,
    out_dtype,
    tiny: float,
    log_tiny: float,
    log_range: float,
    tile_rows: int = 512,
    interpret: bool | None = None,
):
    """One leaf's fused 8-bit AdamW update.

    Args (all blocked to the quantizer layout):
      g2   [nb, 128] grads;  mq/nq [nb, 128] int8/uint8 moments;
      ms/nlo/nhi [nb, 1] f32 block scales;  p2 [nb, 128] params
      (only DMA'd when wd != 0 — pass g2 as a dummy otherwise; it is
      dropped before the pallas_call so no extra traffic occurs);
      scal [1, 4] f32 = (bias_corr1, bias_corr2, lr, row_offset) —
      traced scalars; row_offset is 0 except per-shard under shard_map.

    Returns (upd2, mq2, ms2, nq2, nlo2, nhi2) in the same blocked layout.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = g2.shape[0]
    r = min(tile_rows, max(8, (nb // 8) * 8))
    grid = (-(-nb // r),)

    row_spec = pl.BlockSpec((r, BLOCK), lambda i: (i, 0))
    col_spec = pl.BlockSpec((r, 1), lambda i: (i, 0))
    scal_spec = pl.BlockSpec((1, 4), lambda i: (0, 0))

    in_specs = [scal_spec, row_spec, row_spec, col_spec, row_spec,
                col_spec, col_spec]
    operands = [scal, g2, mq, ms, nq, nlo, nhi]
    if wd:
        in_specs.append(row_spec)
        operands.append(p2)

    kern = functools.partial(
        _kernel, n=n, tile_rows=r, b1=b1, b2=b2, eps=eps, wd=wd,
        tiny=tiny, log_tiny=log_tiny, log_range=log_range)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_spec, row_spec, col_spec, row_spec, col_spec,
                   col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK), out_dtype),      # upd
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.int8),       # mu_q
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),        # mu_scale
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.uint8),      # nu_q
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),        # nu_lo
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),        # nu_hi
        ],
        interpret=interpret,
    )(*operands)
