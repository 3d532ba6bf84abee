"""Fused backward kernels for sliding-window + global attention.

Completes the flash-style pair (forward in ops/flash_sliding.py): the
backward never materializes banded logits in HBM either. Two kernels:

  * kernel 1 — grid over QUERY blocks: recompute the block softmax,
    emit dq and the per-row stats (max m, denominator l, delta =
    Σ p⊙dp), and accumulate the global-token key/value grads (dkg, dvg)
    across blocks in VMEM scratch.
  * kernel 2 — grid over KEY blocks: each key block is attended by the
    3 neighboring query blocks; reconstruct just the [w, w] probability
    slab facing this key block from (q_u, k_i, m_u, l_u), and accumulate
    dk, dv. Out-of-range neighbor blocks (clamped specs) are zeroed
    explicitly to avoid double counting at the edges.

Mask inputs (key_bias, g_bias) are non-differentiable → zero grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_sliding import G_PAD, NEG_INF


def _bwd_dq_kernel(
    q_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref,
    kb_p_ref, kb_c_ref, kb_n_ref,  # [1, 1, w]
    kg_ref, vg_ref,  # [1, G_PAD, dh]
    gb_ref,  # [1, 1, G_PAD]
    do_ref,  # [1, w, dh]
    dq_ref,  # out [1, w, dh]
    m_ref, l_ref, delta_ref,  # out [1, 1, w] (per query row)
    dkg_ref, dvg_ref,  # out [1, G_PAD, dh]
    dkg_acc, dvg_acc,  # scratch [G_PAD, dh] f32
    *,
    w: int,
    n_blocks: int,
    dh: int,
):
    j = pl.program_id(1)
    nn = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dkg_acc[:] = jnp.zeros_like(dkg_acc)
        dvg_acc[:] = jnp.zeros_like(dvg_acc)

    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    q = q_ref[0].astype(jnp.float32) * scale  # [w, dh]
    do = do_ref[0].astype(jnp.float32)  # [w, dh]
    q_pos = j * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)

    parts = []
    m = jnp.full((w, 1), NEG_INF, jnp.float32)
    for t, (k_ref, kb_ref) in enumerate(
        [(kp_ref, kb_p_ref), (kc_ref, kb_c_ref), (kn_ref, kb_n_ref)]
    ):
        s = jax.lax.dot_general(
            q, k_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        blk = j + t - 1
        k_pos = blk * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        ok = (
            (jnp.abs(k_pos - q_pos) <= w)
            & (k_pos >= 0)
            & (k_pos < n_blocks * w)
        )
        s = jnp.where(ok, s + kb_ref[0, 0][None, :], NEG_INF)
        parts.append(s)
        m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))

    sg = jax.lax.dot_general(
        q, kg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gb_ref[0, 0][None, :]
    m = jnp.maximum(m, jnp.max(sg, axis=-1, keepdims=True))

    es = [jnp.exp(s - m) for s in parts]
    eg = jnp.exp(sg - m)
    l = sum(e.sum(axis=-1, keepdims=True) for e in es) + eg.sum(
        axis=-1, keepdims=True
    )
    l = jnp.maximum(l, 1e-30)

    # dp and delta
    dps = []
    delta = jnp.zeros((w, 1), jnp.float32)
    for t, v_ref in enumerate([vp_ref, vc_ref, vn_ref]):
        dp = jax.lax.dot_general(
            do, v_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [w, w]
        dps.append(dp)
        delta = delta + jnp.sum((es[t] / l) * dp, axis=-1, keepdims=True)
    dp_g = jax.lax.dot_general(
        do, vg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [w, G]
    pg = eg / l
    delta = delta + jnp.sum(pg * dp_g, axis=-1, keepdims=True)

    dq = jnp.zeros((w, dh), jnp.float32)
    for t, k_ref in enumerate([kp_ref, kc_ref, kn_ref]):
        ds = (es[t] / l) * (dps[t] - delta)
        dq = dq + jax.lax.dot_general(
            ds, k_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ds_g = pg * (dp_g - delta)
    dq = dq + jax.lax.dot_general(
        ds_g, kg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)

    m_ref[0, 0] = m[:, 0]
    l_ref[0, 0] = l[:, 0]
    delta_ref[0, 0] = delta[:, 0]

    dkg_acc[:] = dkg_acc[:] + jax.lax.dot_general(
        ds_g, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, dh] (q already carries the scale)
    dvg_acc[:] = dvg_acc[:] + jax.lax.dot_general(
        pg, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nn - 1)
    def _emit():
        dkg_ref[0] = dkg_acc[:].astype(dkg_ref.dtype)
        dvg_ref[0] = dvg_acc[:].astype(dvg_ref.dtype)


def _bwd_dkv_kernel(
    k_ref, v_ref,  # [1, w, dh] THIS key block (jk)
    qm_ref, qc_ref, qp_ref,  # [1, w, dh] query blocks jk-1, jk, jk+1
    dom_ref, doc_ref, dop_ref,  # [1, w, dh] their dout
    kb_ref,  # [1, 1, w] key bias of THIS block
    mm_ref, mc_ref, mp_ref,  # [1, 1, w] stats of query blocks
    lm_ref, lc_ref, lp_ref,
    dm_ref, dc_ref, dp_ref,
    dk_ref, dv_ref,  # out [1, w, dh]
    *,
    w: int,
    n_blocks: int,
    dh: int,
):
    jk = pl.program_id(1)
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kb = kb_ref[0, 0]
    k_pos = jk * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)

    dk = jnp.zeros((w, dh), jnp.float32)
    dv = jnp.zeros((w, dh), jnp.float32)
    for u, (q_ref, do_ref, m_ref, l_ref, d_ref) in enumerate(
        [
            (qm_ref, dom_ref, mm_ref, lm_ref, dm_ref),
            (qc_ref, doc_ref, mc_ref, lc_ref, dc_ref),
            (qp_ref, dop_ref, mp_ref, lp_ref, dp_ref),
        ]
    ):
        ub = jk + u - 1  # true query-block index (specs clamp at edges)
        valid = jnp.logical_and(ub >= 0, ub < n_blocks)
        q = q_ref[0].astype(jnp.float32) * scale
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        q_pos = ub * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        ok = (
            (jnp.abs(k_pos - q_pos) <= w)
            & (q_pos >= 0)
            & (q_pos < n_blocks * w)
        )
        s = jnp.where(ok, s + kb[None, :], NEG_INF)
        p = jnp.exp(s - m_ref[0, 0][:, None]) / jnp.maximum(
            l_ref[0, 0][:, None], 1e-30
        )
        p = jnp.where(valid, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - d_ref[0, 0][:, None])
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def flash_sliding_backward(
    q, k, v, key_bias, kg, vg, g_bias, do, *, window: int,
    interpret: bool | None = None,
):
    """Returns (dq, dk_band, dv_band, dkg, dvg) with the forward's
    [B, nh, T, dh] / [B, nh, G, dh] shapes. Caller adds the gather
    adjoints (kg/vg are separate custom_vjp inputs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nh, t, dh = q.shape
    w = window
    nb = t // w
    g = kg.shape[2]
    bh = b * nh

    f = lambda x: x.reshape(bh, t, dh)  # noqa: E731
    qf, kf, vf, dof = f(q), f(k), f(v), f(do)
    kgf = jnp.zeros((bh, G_PAD, dh), kg.dtype).at[:, :g].set(
        kg.reshape(bh, g, dh)
    )
    vgf = jnp.zeros((bh, G_PAD, dh), vg.dtype).at[:, :g].set(
        vg.reshape(bh, g, dh)
    )
    gbf = jnp.full((b, 1, G_PAD), NEG_INF, jnp.float32)
    gbf = gbf.at[:, 0, :g].set(g_bias.astype(jnp.float32))
    kbf = key_bias.astype(jnp.float32)[:, None, :]

    def blk(j, d):
        return jnp.clip(j + d, 0, nb - 1)

    kvspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, w, dh), lambda i, j, d=d: (i, blk(j, d), 0)
    )
    kbspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, w), lambda i, j, d=d: (i // nh, 0, blk(j, d))
    )
    statspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, w), lambda i, j, d=d: (i, 0, blk(j, d))
    )
    gspec = pl.BlockSpec((1, G_PAD, dh), lambda i, j: (i, 0, 0))

    dq, m, l, delta, dkg, dvg = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, w=w, n_blocks=nb, dh=dh),
        grid=(bh, nb),
        in_specs=[
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
            kvspec(-1), kvspec(0), kvspec(1),
            kvspec(-1), kvspec(0), kvspec(1),
            kbspec(-1), kbspec(0), kbspec(1),
            gspec, gspec,
            pl.BlockSpec((1, 1, G_PAD), lambda i, j: (i // nh, 0, 0)),
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, 0, j)),
            gspec, gspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, G_PAD, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, G_PAD, dh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G_PAD, dh), jnp.float32),
            pltpu.VMEM((G_PAD, dh), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, kf, kf, vf, vf, vf, kbf, kbf, kbf, kgf, vgf, gbf, dof)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, w=w, n_blocks=nb, dh=dh),
        grid=(bh, nb),
        in_specs=[
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
            kvspec(-1), kvspec(0), kvspec(1),  # q blocks jk-1..jk+1
            kvspec(-1), kvspec(0), kvspec(1),  # do blocks
            pl.BlockSpec((1, 1, w), lambda i, j: (i // nh, 0, j)),  # kb @ jk
            statspec(-1), statspec(0), statspec(1),  # m
            statspec(-1), statspec(0), statspec(1),  # l
            statspec(-1), statspec(0), statspec(1),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, w, dh), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
        ],
        interpret=interpret,
    )(
        kf, vf, qf, qf, qf, dof, dof, dof, kbf,
        m, m, m, l, l, l, delta, delta, delta,
    )

    r4 = lambda x: x.reshape(b, nh, t, dh)  # noqa: E731
    dkg = dkg[:, :g].reshape(b, nh, g, dh).astype(kg.dtype)
    dvg = dvg[:, :g].reshape(b, nh, g, dh).astype(vg.dtype)
    return r4(dq), r4(dk), r4(dv), dkg, dvg
