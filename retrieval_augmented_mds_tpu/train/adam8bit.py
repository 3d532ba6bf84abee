"""Blockwise 8-bit AdamW: int8/uint8 moment storage, f32 math.

The optimizer update is a zero-FLOP, pure-HBM-bandwidth phase (measured
10.6 ms of a 41.4 ms B=2 train step, artifacts/train_phase_breakdown.json;
the update itself runs at ~1.3x the HBM roofline,
artifacts/opt_update_bench.jsonl). Its cost is exactly the bytes moved per
parameter, so the lever is state width. The reference reaches for
DeepSpeedCPUAdam + ZeRO offload to fit Adam moments at all
(sotasum/lightning_model.py:16, pretrain.py:605-614); the TPU-native answer
is to shrink the moments to 8 bits and keep them in HBM:

  f32 state        :  grads 4r + params 4r4w + mu 4r4w + nu 4r4w = 28 B/param
  bf16-mu (default):  .. + mu 2r2w + nu 4r4w                     = 24 B/param
  8-bit (this file):  .. + mu 1r1w + nu 1r1w (+ ~0.1 scales)     = 16 B/param

plus ~6 bytes/param of HBM *capacity* freed (~1.6 GB on the 268M-param RAG
model) — headroom that directly attacks the B=16 HBM-pressure regression.

Quantization (per 128-element block, following the blockwise scheme of
Dettmers et al., "8-bit Optimizers via Block-wise Quantization", but with
TPU-friendly analytic codes instead of a lookup codebook):

* first moment ``mu`` (signed, zero-mean-ish): symmetric linear int8 —
  ``q = round(mu / s), s = absmax/127``. Max abs error s/2 per element; mu
  is an EMA of gradients whose low bits are noise (the bf16-mu default
  already relies on this).
* second moment ``nu`` (non-negative, spans many orders of magnitude
  within one block): affine-in-log2 uint8 — store ``lo, hi`` of
  ``log2(nu)`` per block (range-clamped to 40 log2 units ≈ 12 decades) and
  ``q = round(255 * (log2(nu) - lo)/(hi - lo))``. Linear-domain codes
  crush small nu to 0 and blow up ``m/sqrt(nu)``; log-domain codes bound
  the *relative* error at ``2^(40/255/2) - 1 ≈ 5.6%`` in nu (≤ 2.8% in the
  step size), independent of the block's dynamic range. Elements clamped
  at ``hi - 40`` have sqrt(nu) at or below Adam's eps scale.

Quant/dequant are elementwise VPU ops + a per-block reduction; XLA fuses
them into the single HBM pass over the state, so the arithmetic is free
relative to the traffic it saves.

Semantics match ``optax.adamw`` (scale_by_adam + add_decayed_weights +
scale_by_learning_rate): bias correction at count+1, schedule evaluated at
the pre-increment count, decoupled weight decay added before the lr scale.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 128  # lane width; per-block scales cost 4/128 B/param per scale
_LOG_RANGE = 40.0  # max log2(nu) spread kept per block (~12 decades)
# log2 floor. Must be a NORMAL f32 (subnormals are flushed to zero on
# TPU/XLA, and log2(0) = -inf poisons the block scales with NaN).
# sqrt(_TINY) = 1e-15 << adam eps.
_TINY = 1e-30
_LOG_TINY = math.log2(_TINY)


class Adam8bitState(NamedTuple):
    """Optax state. ``mu_q``/``nu_q`` etc. are pytrees mirroring params;
    every leaf is blocked to [n_blocks, BLOCK] (param flattened + padded)."""

    count: jnp.ndarray  # int32 scalar
    mu_q: Any  # int8 [nb, BLOCK]
    mu_scale: Any  # f32 [nb, 1]
    nu_q: Any  # uint8 [nb, BLOCK]
    nu_lo: Any  # f32 [nb, 1], log2 domain
    nu_hi: Any  # f32 [nb, 1], log2 domain


def _blocked_shape(n: int) -> tuple[int, int]:
    return (-(-n // BLOCK), BLOCK)


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    flat = x.reshape(-1).astype(jnp.float32)
    nb, _ = _blocked_shape(flat.size)
    pad = nb * BLOCK - flat.size
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(nb, BLOCK)


def _valid_mask(n: int) -> jnp.ndarray:
    """[nb, BLOCK] bool, True on real (non-pad) elements. Built from iota —
    no HBM traffic."""
    nb, _ = _blocked_shape(n)
    idx = jax.lax.broadcasted_iota(jnp.int32, (nb, BLOCK), 0) * BLOCK
    idx = idx + jax.lax.broadcasted_iota(jnp.int32, (nb, BLOCK), 1)
    return idx < n


def quantize_mu(mu: jnp.ndarray, mask: jnp.ndarray):
    """Symmetric linear int8 per block. Returns (q int8, scale f32 [nb,1])."""
    absmax = jnp.max(jnp.abs(jnp.where(mask, mu, 0.0)), axis=1, keepdims=True)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(mu / safe), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_mu(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


def quantize_nu(nu: jnp.ndarray, mask: jnp.ndarray):
    """Affine-in-log2 uint8 per block. Returns (q uint8, lo, hi f32 [nb,1])."""
    log = jnp.log2(jnp.maximum(nu, _TINY))
    log = jnp.where(mask, log, _LOG_TINY)
    hi = jnp.max(jnp.where(mask, log, -jnp.inf), axis=1, keepdims=True)
    hi = jnp.maximum(hi, _LOG_TINY)  # all-pad rows can't occur; all-zero can
    lo = jnp.min(jnp.where(mask, log, jnp.inf), axis=1, keepdims=True)
    lo = jnp.clip(lo, hi - _LOG_RANGE, hi)
    rng = jnp.maximum(hi - lo, 1e-6)
    q = jnp.round(jnp.clip((log - lo) / rng, 0.0, 1.0) * 255.0)
    return q.astype(jnp.uint8), lo, hi


def dequantize_nu(q: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray):
    rng = jnp.maximum(hi - lo, 1e-6)
    nu = jnp.exp2(lo + q.astype(jnp.float32) / 255.0 * rng)
    # exact zero survives the roundtrip as _TINY; that's below eps^2 and
    # indistinguishable from 0 in the step.
    return nu


def _sharded_leaf_update(gb, mq, ms, nq, nlo, nhi, pb, scal, *, mesh, axis,
                         update_fn, **kw):
    """Run the fused kernel per-shard under ``shard_map`` so ZeRO-sharded
    optimizer state never gathers: rows are padded to a shard multiple
    (appended pad rows land in the LAST shard, where their global indices
    are >= n and the kernel's validity mask neutralizes them), each shard
    passes its global row offset through scal[0,3], and pad rows are
    sliced off the outputs. The param-shaped update the caller reshapes
    is row-sharded here; GSPMD all-gathers it at the apply site — exactly
    the ZeRO-2 gather point."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    ax = int(mesh.shape[axis])
    nb = gb.shape[0]
    nb_pad = -(-nb // ax) * ax
    pad = nb_pad - nb

    def padrow(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    args = tuple(padrow(x) for x in (gb, mq, ms, nq, nlo, nhi, pb))
    nb_loc = nb_pad // ax

    def shard_fn(gb, mq, ms, nq, nlo, nhi, pb, scal):
        off = jax.lax.axis_index(axis) * nb_loc
        scal = scal.at[0, 3].set(off.astype(jnp.float32))
        return update_fn(gb, mq, ms, nq, nlo, nhi, pb, scal, **kw)

    row = P(axis, None)
    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(row,) * 7 + (P(None, None),),
        out_specs=(row,) * 6,
        check_vma=False,
    )(*args, scal)
    if pad:
        out = tuple(x[:nb] for x in out)
    return out


def adamw8bit(
    learning_rate: float | Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    fused: bool = True,
    mesh=None,
    shard_axis: str = "data",
) -> optax.GradientTransformation:
    """Drop-in for ``optax.adamw`` with blockwise 8-bit moment storage.

    ``fused=True`` (default) routes large leaves through the single-pass
    Pallas kernel (ops/adam8bit_update.py) on TPU — the XLA lowering of
    the quantizer reductions runs at 3.76x the HBM roofline, the kernel
    at ~1x. The XLA composite below remains the oracle, the CPU path,
    and the path under RAMDS_FORCE_XLA_OPS=1.

    ``mesh`` composes the fused kernel with ZeRO-sharded optimizer state:
    a bare pallas_call is not SPMD-partitioned (XLA would gather the
    sharded state to run it), so when a mesh with >1 device on
    ``shard_axis`` is given, each leaf's blocked arrays are padded to a
    shard multiple and the kernel runs per-shard under ``shard_map`` —
    the state stays sharded, each chip streams only its rows, and the
    param-shaped update is re-gathered by GSPMD exactly where ZeRO-2
    gathers it. Single-device semantics are identical (parity-tested)."""

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        def zeros_like_blocked(p, dtype):
            nb, _ = _blocked_shape(int(p.size))
            return jnp.zeros((nb, BLOCK), dtype)

        def scale_like(p, fill):
            nb, _ = _blocked_shape(int(p.size))
            return jnp.full((nb, 1), fill, jnp.float32)

        log_tiny = _LOG_TINY
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu_q=jax.tree_util.tree_map(
                lambda p: zeros_like_blocked(p, jnp.int8), params),
            mu_scale=jax.tree_util.tree_map(
                lambda p: scale_like(p, 0.0), params),
            nu_q=jax.tree_util.tree_map(
                lambda p: zeros_like_blocked(p, jnp.uint8), params),
            nu_lo=jax.tree_util.tree_map(
                lambda p: scale_like(p, log_tiny), params),
            nu_hi=jax.tree_util.tree_map(
                lambda p: scale_like(p, log_tiny), params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw8bit needs params (weight decay + shapes)")
        count = state.count
        c = count + 1
        bc1 = 1.0 - b1 ** c.astype(jnp.float32)
        bc2 = 1.0 - b2 ** c.astype(jnp.float32)
        lr = sched(count)

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_mq = treedef.flatten_up_to(state.mu_q)
        leaves_ms = treedef.flatten_up_to(state.mu_scale)
        leaves_nq = treedef.flatten_up_to(state.nu_q)
        leaves_nlo = treedef.flatten_up_to(state.nu_lo)
        leaves_nhi = treedef.flatten_up_to(state.nu_hi)

        use_fused = False
        if fused:
            from ..ops.adam8bit_update import (
                MIN_FUSED_SIZE,
                adam8bit_leaf_update,
                fused_enabled,
            )

            use_fused = fused_enabled()
        n_shards = (
            int(mesh.shape.get(shard_axis, 1)) if mesh is not None else 1
        )
        scal = None
        if use_fused:
            zero = jnp.zeros((), jnp.float32)  # row offset (per-shard)
            scal = jnp.stack([bc1, bc2, lr, zero]).astype(jnp.float32)
            scal = scal.reshape(1, 4)

        upds, mqs, mss, nqs, nlos, nhis = [], [], [], [], [], []
        for p, g, mq, ms, nq, nlo, nhi in zip(
            leaves_p, leaves_g, leaves_mq, leaves_ms, leaves_nq,
            leaves_nlo, leaves_nhi,
        ):
            n = int(p.size)
            gb = _to_blocks(g)
            if use_fused and n >= MIN_FUSED_SIZE:
                pb = _to_blocks(p) if weight_decay else gb  # dummy if no wd
                kw = dict(
                    n=n, b1=b1, b2=b2, eps=eps,
                    wd=float(weight_decay),
                    out_dtype=jnp.dtype(p.dtype),
                    tiny=_TINY, log_tiny=_LOG_TINY, log_range=_LOG_RANGE,
                )
                if n_shards > 1:
                    upd, q, s, qn, lo, hi = _sharded_leaf_update(
                        gb, mq, ms, nq, nlo, nhi, pb, scal,
                        mesh=mesh, axis=shard_axis,
                        update_fn=adam8bit_leaf_update, **kw,
                    )
                else:
                    upd, q, s, qn, lo, hi = adam8bit_leaf_update(
                        gb, mq, ms, nq, nlo, nhi, pb, scal, **kw,
                    )
                upds.append(upd.reshape(-1)[:n].reshape(p.shape))
                mqs.append(q)
                mss.append(s)
                nqs.append(qn)
                nlos.append(lo)
                nhis.append(hi)
                continue
            mask = _valid_mask(n)
            mu = b1 * dequantize_mu(mq, ms) + (1.0 - b1) * gb
            nu = b2 * dequantize_nu(nq, nlo, nhi) + (1.0 - b2) * gb * gb
            mhat = mu / bc1
            nuhat = nu / bc2
            step = mhat / (jnp.sqrt(nuhat) + eps)
            step = step.reshape(-1)[:n].reshape(p.shape)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            upds.append((-lr * step).astype(p.dtype))
            q, s = quantize_mu(mu, mask)
            mqs.append(q)
            mss.append(s)
            q, lo, hi = quantize_nu(nu, mask)
            nqs.append(q)
            nlos.append(lo)
            nhis.append(hi)

        unflat = jax.tree_util.tree_unflatten
        new_state = Adam8bitState(
            count=c,
            mu_q=unflat(treedef, mqs),
            mu_scale=unflat(treedef, mss),
            nu_q=unflat(treedef, nqs),
            nu_lo=unflat(treedef, nlos),
            nu_hi=unflat(treedef, nhis),
        )
        return unflat(treedef, upds), new_state

    return optax.GradientTransformation(init, update)
