"""Blockwise 8-bit AdamW: int8/uint8 moment storage, f32 math, ONE
superleaf layout for the whole model.

The optimizer update is a zero-FLOP, pure-HBM-bandwidth phase (measured
10.6 ms of a 41.4 ms B=2 train step, artifacts/train_phase_breakdown.json;
the bf16-mu update runs at ~1.3-1.5x the HBM roofline,
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

Superleaf layout (round 5; the round-4 per-leaf layout measured 4.57x
roofline): ALL leaves' moments live in single ``[NB, 128]`` arrays —
each leaf owns a contiguous, block-aligned range of rows, assigned in
``tree_flatten`` order; a per-block ``nvalid`` element count (int32
[NB, 1], part of the state) marks leaf-tail and inter-leaf padding as
inert. The whole model's update is then ONE streaming pass — a single
Pallas kernel call on TPU (ops/adam8bit_update.py) instead of ~250
per-leaf launches with pad copies at every kernel boundary, and the XLA
composite oracle runs on the same superarrays. Grad clipping rides the
grads concat: the global norm reduces out of the concat pass and enters
the kernel as a scalar scale, so no separate clip pass over the grads
exists (build_optimizer routes ``grad_clip`` here when state_8bit).
``NB`` is rounded up to a multiple of the mesh's ``data``-axis size at
init, so the ZeRO composition is one row-sharded shard_map with no
runtime padding.

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

Semantics match ``optax.adamw`` (scale_by_adam + add_decayed_weights +
scale_by_learning_rate): bias correction at count+1, schedule evaluated at
the pre-increment count, decoupled weight decay added before the lr scale.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 128  # lane width; per-block scales cost 4/128 B/param per scale
_LOG_RANGE = 40.0  # max log2(nu) spread kept per block (~12 decades)
# log2 floor. Must be a NORMAL f32 (subnormals are flushed to zero on
# TPU/XLA, and log2(0) = -inf poisons the block scales with NaN).
# sqrt(_TINY) = 1e-15 << adam eps.
_TINY = 1e-30
_LOG_TINY = math.log2(_TINY)


class Adam8bitState(NamedTuple):
    """Optax state in the superleaf layout: single blocked arrays holding
    every leaf's moments back to back (leaf order = tree_flatten order,
    each leaf padded up to a block boundary)."""

    count: jnp.ndarray  # int32 scalar
    mu_q: jnp.ndarray  # int8 [NB, BLOCK]
    mu_scale: jnp.ndarray  # f32 [NB, 1]
    nu_q: jnp.ndarray  # uint8 [NB, BLOCK]
    nu_lo: jnp.ndarray  # f32 [NB, 1], log2 domain
    nu_hi: jnp.ndarray  # f32 [NB, 1], log2 domain
    nvalid: jnp.ndarray  # int32 [NB, 1], valid elements per block (0=pad)


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
    hi = jnp.maximum(hi, _LOG_TINY)  # all-pad rows CAN occur (superleaf pad)
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


def _layout(leaves, n_shards: int):
    """Per-leaf (n, nb) plus the padded superleaf row count NB (a multiple
    of ``n_shards`` so the ZeRO shard_map needs no runtime padding)."""
    sizes = [int(x.size) for x in leaves]
    nbs = [-(-n // BLOCK) for n in sizes]
    nb_total = sum(nbs)
    nb_padded = -(-max(nb_total, 1) // n_shards) * n_shards
    return sizes, nbs, nb_total, nb_padded


def _nvalid_for(sizes, nbs, nb_padded) -> np.ndarray:
    """int32 [NB, 1]: 128 for full blocks, n % 128 for leaf tails, 0 for
    the inter-leaf / shard padding rows."""
    nv = np.zeros((nb_padded, 1), np.int32)
    off = 0
    for n, nb in zip(sizes, nbs):
        nv[off:off + nb] = BLOCK
        tail = n % BLOCK
        if tail:
            nv[off + nb - 1] = tail
        off += nb
    return nv


def _concat_blocks(leaves, nb_padded: int) -> jnp.ndarray:
    """Flatten + block-pad each leaf, stack into one [NB, 128] f32 array.
    One read of the leaves + one write of the superarray; XLA fuses the
    per-leaf pad/reshape into the concat copy."""
    parts = []
    rows = 0
    for x in leaves:
        b = _to_blocks(x)
        rows += b.shape[0]
        parts.append(b)
    if rows < nb_padded:
        parts.append(jnp.zeros((nb_padded - rows, BLOCK), jnp.float32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _split_updates(upd, leaves_p, nbs, lr=None):
    """Slice the superleaf update back into param-shaped leaves (fused
    into the apply pass by XLA — the slices never materialize twice)."""
    outs = []
    off = 0
    for p, nb in zip(leaves_p, nbs):
        u = upd[off:off + nb].reshape(-1)[: int(p.size)].reshape(p.shape)
        if lr is not None:  # composite path: -lr folded here
            u = -lr * u
        outs.append(u.astype(p.dtype))
        off += nb
    return outs


def adamw8bit(
    learning_rate: float | Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    fused: bool = True,
    mesh=None,
    shard_axis: str = "data",
) -> optax.GradientTransformation:
    """Drop-in for ``optax.adamw`` with blockwise 8-bit moment storage in
    the superleaf layout.

    ``grad_clip`` folds clip-by-global-norm into the update: the norm is
    a reduction over the blocked-grads superarray (fused into the concat
    pass by XLA) and the clip enters the kernel as a scalar scale — the
    separate optax clip pass (one full grads read+write) disappears.
    Semantics match ``optax.chain(clip_by_global_norm(c), adamw8bit(...))``
    up to f32 summation order in the norm.

    ``fused=True`` (default) routes the whole superleaf through ONE
    Pallas kernel call on TPU (ops/adam8bit_update.py). The XLA composite
    below runs on the same superarrays and remains the oracle, the CPU
    path, and the path under RAMDS_FORCE_XLA_OPS=1.

    ``mesh`` composes the fused kernel with ZeRO-sharded optimizer state:
    a bare pallas_call is not SPMD-partitioned (XLA would gather the
    sharded state to run it), so when a mesh with >1 device on
    ``shard_axis`` is given, NB is padded to a shard multiple at init and
    the kernel runs per-shard under ``shard_map`` — the state stays
    sharded, each chip streams only its rows (``nvalid`` shards along),
    and the param-shaped update is re-gathered by GSPMD exactly where
    ZeRO-2 gathers it. Single-device semantics are identical
    (parity-tested)."""

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    n_shards = int(mesh.shape.get(shard_axis, 1)) if mesh is not None else 1

    def init(params):
        leaves = jax.tree_util.tree_leaves(params)
        sizes, nbs, _, nb = _layout(leaves, n_shards)
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu_q=jnp.zeros((nb, BLOCK), jnp.int8),
            mu_scale=jnp.zeros((nb, 1), jnp.float32),
            nu_q=jnp.zeros((nb, BLOCK), jnp.uint8),
            nu_lo=jnp.full((nb, 1), _LOG_TINY, jnp.float32),
            nu_hi=jnp.full((nb, 1), _LOG_TINY, jnp.float32),
            nvalid=jnp.asarray(_nvalid_for(sizes, nbs, nb)),
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
        sizes, nbs, _, nb = _layout(leaves_p, n_shards)
        if nb != state.mu_q.shape[0]:
            raise ValueError(
                f"superleaf row count {nb} != state {state.mu_q.shape[0]} "
                "(params structure or mesh changed since init)")

        g2 = _concat_blocks(leaves_g, nb)
        if grad_clip:
            # pad rows are zero, so the superarray norm == the tree norm
            # (optax.global_norm) up to summation order
            gnorm = jnp.sqrt(jnp.sum(g2 * g2))
            clip = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-30))
        else:
            clip = jnp.float32(1.0)

        use_fused = False
        if fused:
            from ..ops.adam8bit_update import (
                adam8bit_superleaf_update,
                fused_enabled,
            )

            use_fused = fused_enabled()

        if use_fused:
            p2 = (
                _concat_blocks(leaves_p, nb) if weight_decay else g2
            )  # dummy when wd == 0 (dropped before the pallas_call)
            scal = jnp.stack([bc1, bc2, lr, clip]).astype(jnp.float32)
            scal = scal.reshape(1, 4)
            kw = dict(
                b1=b1, b2=b2, eps=eps, wd=float(weight_decay),
                out_dtype=jnp.float32,
                tiny=_TINY, log_tiny=_LOG_TINY, log_range=_LOG_RANGE,
            )
            if n_shards > 1:
                from jax.sharding import PartitionSpec as P

                row = P(shard_axis, None)

                def shard_fn(g2, mq, ms, nq, nlo, nhi, nv, p2, scal):
                    return adam8bit_superleaf_update(
                        g2, mq, ms, nq, nlo, nhi, nv, p2, scal, **kw)

                upd, mq2, ms2, nq2, nlo2, nhi2 = jax.shard_map(
                    shard_fn, mesh=mesh,
                    in_specs=(row,) * 8 + (P(None, None),),
                    out_specs=(row,) * 6,
                    check_vma=False,
                )(g2, state.mu_q, state.mu_scale, state.nu_q,
                  state.nu_lo, state.nu_hi, state.nvalid, p2, scal)
            else:
                upd, mq2, ms2, nq2, nlo2, nhi2 = adam8bit_superleaf_update(
                    g2, state.mu_q, state.mu_scale, state.nu_q,
                    state.nu_lo, state.nu_hi, state.nvalid, p2, scal, **kw)
            upds = _split_updates(upd, leaves_p, nbs)
        else:
            # XLA composite oracle — same superarrays, same expressions
            # in the same association order as the kernel.
            lane = jax.lax.broadcasted_iota(jnp.int32, (nb, BLOCK), 1)
            mask = lane < state.nvalid
            g = g2 * clip
            mu = b1 * dequantize_mu(state.mu_q, state.mu_scale) + (1.0 - b1) * g
            nu = (
                b2 * dequantize_nu(state.nu_q, state.nu_lo, state.nu_hi)
                + (1.0 - b2) * g * g
            )
            step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            if weight_decay:
                step = step + weight_decay * _concat_blocks(leaves_p, nb)
            upds = _split_updates(step, leaves_p, nbs, lr=lr)
            mq2, ms2 = quantize_mu(mu, mask)
            nq2, nlo2, nhi2 = quantize_nu(nu, mask)

        new_state = Adam8bitState(
            count=c, mu_q=mq2, mu_scale=ms2, nu_q=nq2, nu_lo=nlo2,
            nu_hi=nhi2, nvalid=state.nvalid,
        )
        return jax.tree_util.tree_unflatten(treedef, upds), new_state

    return optax.GradientTransformation(init, update)
