"""Fused Pallas kernel for the blockwise 8-bit AdamW update (superleaf).

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

Why ONE kernel for the whole model (the superleaf): the round-4 shipped
version ran this kernel once per parameter leaf (~250 calls/step at
LED-base scale) and measured **4.57x roofline** — per-call launch
overhead plus a pad-copy of every unaligned leaf's grads and updates at
each kernel boundary dominated the streaming time. train/adam8bit.py now
stores ALL leaves' moments in single [NB, 128] arrays (each leaf owns a
contiguous block range) and calls this kernel exactly once per step; the
per-block valid-element count ``nvalid`` replaces the per-leaf tail
masks, so inter-leaf padding blocks are inert. Grad clipping rides the
grad concat (the clip *scale* comes in as a traced scalar), so no
separate clip pass over the grads exists either.

Semantics match the train/adam8bit.py XLA composite expression-for-
expression (same block layout, same quantizer math in the same
association order, same jnp.round half-to-even) — parity-tested in
tests/test_adam8bit.py both in interpret mode and, via
tools/run_hw_measurements_r5.sh, on hardware. Exact bitwise equality is
not guaranteed across backends (XLA may fuse/reassociate the composite
differently), so the parity test pins a tight float tolerance instead.
The composite remains the correctness oracle, the CPU path, and the path
under RAMDS_FORCE_XLA_OPS=1 — and it runs on the SAME superleaf layout,
so toggling the kernel never changes the optimizer state tree.

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
            nv_ref, *refs, tile_rows, b1, b2, eps, wd, tiny, log_tiny,
            log_range):
    # params stream exists only when weight decay is active — at wd == 0
    # the kernel reads exactly the grad/state streams.
    if wd:
        p_ref, upd_ref, mq2_ref, ms2_ref, nq2_ref, nlo2_ref, nhi2_ref = refs
    else:
        upd_ref, mq2_ref, ms2_ref, nq2_ref, nlo2_ref, nhi2_ref = refs
    bc1 = scal_ref[0, 0]
    bc2 = scal_ref[0, 1]
    lr = scal_ref[0, 2]
    clip = scal_ref[0, 3]  # global-norm clip scale (1.0 = no clipping)

    g = g_ref[...].astype(jnp.float32) * clip
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

    # validity mask: pad elements (leaf tails and inter-leaf pad blocks)
    # must not steer the per-block scales — same rule as
    # adam8bit._valid_mask, but driven by the per-block count nvalid
    # instead of a global element index, so the superleaf layout and the
    # ZeRO row-sharded layout use identical kernel code (no offsets).
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, BLOCK), 1)
    mask = lane < nv_ref[...]

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
    static_argnames=("b1", "b2", "eps", "wd", "out_dtype", "tile_rows",
                     "interpret", "tiny", "log_tiny", "log_range"),
)
def adam8bit_superleaf_update(
    g2, mq, ms, nq, nlo, nhi, nv, p2, scal, *,
    b1: float,
    b2: float,
    eps: float,
    wd: float,
    out_dtype,
    tiny: float,
    log_tiny: float,
    log_range: float,
    tile_rows: int = 1024,
    interpret: bool | None = None,
):
    """The whole model's fused 8-bit AdamW update in ONE kernel call.

    Args (all in the superleaf blocked layout, train/adam8bit.py):
      g2   [NB, 128] grads;  mq/nq [NB, 128] int8/uint8 moments;
      ms/nlo/nhi [NB, 1] f32 block scales;  nv [NB, 1] int32 valid
      element count per block (0 for pure padding blocks);
      p2 [NB, 128] params (only DMA'd when wd != 0 — pass g2 as a dummy
      otherwise; it is dropped before the pallas_call so no extra
      traffic occurs);
      scal [1, 4] f32 = (bias_corr1, bias_corr2, lr, clip_scale) —
      traced scalars; clip_scale folds clip-by-global-norm into the
      update (1.0 when clipping is off).

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
                col_spec, col_spec, col_spec]
    operands = [scal, g2, mq, ms, nq, nlo, nhi, nv]
    if wd:
        in_specs.append(row_spec)
        operands.append(p2)

    kern = functools.partial(
        _kernel, tile_rows=r, b1=b1, b2=b2, eps=eps, wd=wd,
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
