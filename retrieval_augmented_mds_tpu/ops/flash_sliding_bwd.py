"""Fused backward kernel for sliding-window + global attention.

Completes the flash-style pair (forward in ops/flash_sliding.py): the
backward never materializes banded logits in HBM either.

ONE merged kernel (grid over query blocks), not the classic dq-kernel +
dkv-kernel split. The split recomputes the score and dp matmuls twice —
21 [w,w,dh] matmul-units per block vs the 15 of an ideal fused flash
backward (measured on v5e as a 3.4x bwd/fwd ratio where flash-ideal is
~2.5x). The merge exploits the TPU grid's sequential execution: at grid
step j the kernel owns the pair group

    G(j) = {(q_j,k_j), (q_j,k_{j+1}), (q_{j+1},k_j)}

so every banded (query-block, key-block) pair is visited exactly once.
dq_j / dk_j / dv_j each still need one contribution produced at step
j-1 (pairs (q_j,k_{j-1}) and (q_{j-1},k_j) belong to group j-1): those
live in VMEM carry scratch for exactly one step, and block j's grads
are complete — and emitted — at step j.

Softmax statistics (running max m, denominator l) are NOT recomputed:
the forward kernel emits them (ops/flash_sliding.py `return_stats`),
and the per-row delta = sum_k p*dp collapses to rowsum(do * out) — the
FlashAttention-2 identity — computed by the caller in XLA. m and l stay
separate (not folded into one LSE): for a fully-masked row m = -1e9 and
the fold would lose the log-denominator to f32 rounding, silently
turning the forward's uniform-probability convention into p = 1.

Mask inputs (key_bias, g_bias) are non-differentiable → zero grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_sliding import G_PAD, NEG_INF, block_for


def _bwd_kernel(
    qc_ref, qn_ref,  # [1, w, dh] query blocks j, j+1 (clamped)
    doc_ref, don_ref,  # [1, w, dh] their dout
    kc_ref, kn_ref,  # [1, w, dh] key blocks j, j+1 (clamped)
    vc_ref, vn_ref,
    kbc_ref, kbn_ref,  # [1, 1, w] additive key bias of blocks j, j+1
    mc_ref, mn_ref,  # [1, 1, w] forward stats of query blocks j, j+1
    lc_ref, ln_ref,
    dc_ref, dn_ref,  # [1, 1, w] delta = rowsum(do*out)
    kg_ref, vg_ref,  # [1, G_PAD, dh] global-token keys/values
    gb_ref,  # [1, 1, G_PAD]
    dq_ref, dk_ref, dv_ref,  # out [1, w, dh] block j
    dkg_ref, dvg_ref,  # out [1, G_PAD, dh] f32, accumulated across j
    dq_carry, dk_carry, dv_carry,  # scratch [w, dh] f32
    *,
    w: int,  # band half-width (attention reach)
    blk: int,  # 128-lane-aligned tile size, >= w
    n_blocks: int,
    dh: int,
):
    j = pl.program_id(1)
    nn = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dq_carry[:] = jnp.zeros_like(dq_carry)
        dk_carry[:] = jnp.zeros_like(dk_carry)
        dv_carry[:] = jnp.zeros_like(dv_carry)
        dkg_ref[0] = jnp.zeros_like(dkg_ref[0])
        dvg_ref[0] = jnp.zeros_like(dvg_ref[0])

    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    qc = qc_ref[0].astype(jnp.float32) * scale  # [w, dh], scale folded in
    qn = qn_ref[0].astype(jnp.float32) * scale
    doc = doc_ref[0].astype(jnp.float32)
    don = don_ref[0].astype(jnp.float32)
    kc = kc_ref[0].astype(jnp.float32)
    kn = kn_ref[0].astype(jnp.float32)
    vc = vc_ref[0].astype(jnp.float32)
    vn = vn_ref[0].astype(jnp.float32)
    mc = mc_ref[0, 0][:, None]
    mn = mn_ref[0, 0][:, None]
    lc = jnp.maximum(lc_ref[0, 0][:, None], 1e-30)
    ln = jnp.maximum(ln_ref[0, 0][:, None], 1e-30)
    dlc = dc_ref[0, 0][:, None]
    dln = dn_ref[0, 0][:, None]
    # pairs touching block j+1 are void on the last step (clamped refs
    # would alias block j; the scalar mask also covers the all-masked-row
    # case where m = -1e9 makes the position mask ineffective)
    nxt = jnp.where(j + 1 < n_blocks, 1.0, 0.0)

    def pair(q_s, do_a, m_a, l_a, delta_a, qblk, kmat, vmat, kb, kblk,
             gate):
        """One (query-block, key-block) interaction: returns the three
        grad contributions (dq to the query block — WITHOUT the final
        scale factor — dk, dv to the key block)."""
        s = jax.lax.dot_general(
            q_s, kmat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk, blk]
        q_pos = qblk * blk + jax.lax.broadcasted_iota(
            jnp.int32, (blk, blk), 0
        )
        k_pos = kblk * blk + jax.lax.broadcasted_iota(
            jnp.int32, (blk, blk), 1
        )
        ok = (
            (jnp.abs(k_pos - q_pos) <= w)
            & (k_pos >= 0) & (k_pos < n_blocks * blk)
            & (q_pos >= 0) & (q_pos < n_blocks * blk)
        )
        s = jnp.where(ok, s + kb[None, :], NEG_INF)
        p = (jnp.exp(s - m_a) / l_a) * gate
        dp = jax.lax.dot_general(
            do_a, vmat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_a)
        dq_c = jax.lax.dot_general(
            ds, kmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(
            ds, q_s, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # q_s carries the scale → dk is final
        dv_c = jax.lax.dot_general(
            p, do_a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq_c, dk_c, dv_c

    kbc = kbc_ref[0, 0]
    kbn = kbn_ref[0, 0]

    # pair (q_j, k_j)
    dq_a, dk_a, dv_a = pair(qc, doc, mc, lc, dlc, j, kc, vc, kbc, j, 1.0)
    # pair (q_j, k_{j+1}) — dk/dv land in next step's carry
    dq_b, dk_b, dv_b = pair(qc, doc, mc, lc, dlc, j, kn, vn, kbn, j + 1,
                            nxt)
    # pair (q_{j+1}, k_j) — dq lands in next step's carry
    dq_c, dk_c, dv_c = pair(qn, don, mn, ln, dln, j + 1, kc, vc, kbc, j,
                            nxt)

    # global columns for q_j
    sg = jax.lax.dot_general(
        qc, kg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gb_ref[0, 0][None, :]
    pg = jnp.exp(sg - mc) / lc
    dp_g = jax.lax.dot_general(
        doc, vg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_g = pg * (dp_g - dlc)
    dq_g = jax.lax.dot_general(
        ds_g, kg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq_ref[0] = (
        (dq_carry[:] + dq_a + dq_b + dq_g) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (dk_carry[:] + dk_a + dk_c).astype(dk_ref.dtype)
    dv_ref[0] = (dv_carry[:] + dv_a + dv_c).astype(dv_ref.dtype)
    dq_carry[:] = dq_c
    dk_carry[:] = dk_b
    dv_carry[:] = dv_b

    dkg_ref[0] = dkg_ref[0] + jax.lax.dot_general(
        ds_g, qc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvg_ref[0] = dvg_ref[0] + jax.lax.dot_general(
        pg, doc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def flash_sliding_backward(
    q, k, v, key_bias, kg, vg, g_bias, do, m, l, delta, *, window: int,
    interpret: bool | None = None,
):
    """Returns (dq, dk_band, dv_band, dkg, dvg) with the forward's
    [B, nh, T, dh] / [B, nh, G, dh] shapes. Caller adds the gather
    adjoints (kg/vg are separate custom_vjp inputs).

    m, l: the forward kernel's softmax stats, [B*nh, 1, T] f32
    (flash_sliding_attention(..., return_stats=True)).
    delta: rowsum(do * out), [B*nh, 1, T] f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nh, t, dh = q.shape
    w = window
    blk = block_for(w)
    assert t % blk == 0
    nb = t // blk
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

    def nbr(j, d):
        return jnp.clip(j + d, 0, nb - 1)

    kvspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, blk, dh), lambda i, j, d=d: (i, nbr(j, d), 0)
    )
    kbspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, blk), lambda i, j, d=d: (i // nh, 0, nbr(j, d))
    )
    statspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, blk), lambda i, j, d=d: (i, 0, nbr(j, d))
    )
    gspec = pl.BlockSpec((1, G_PAD, dh), lambda i, j: (i, 0, 0))

    dq, dk, dv, dkg, dvg = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, blk=blk, n_blocks=nb, dh=dh),
        grid=(bh, nb),
        in_specs=[
            kvspec(0), kvspec(1),  # q
            kvspec(0), kvspec(1),  # do
            kvspec(0), kvspec(1),  # k
            kvspec(0), kvspec(1),  # v
            kbspec(0), kbspec(1),
            statspec(0), statspec(1),  # m
            statspec(0), statspec(1),  # l
            statspec(0), statspec(1),  # delta
            gspec, gspec,
            pl.BlockSpec((1, 1, G_PAD), lambda i, j: (i // nh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk, dh), lambda i, j: (i, j, 0)),
            gspec, gspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, G_PAD, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, G_PAD, dh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, dh), jnp.float32),
            pltpu.VMEM((blk, dh), jnp.float32),
            pltpu.VMEM((blk, dh), jnp.float32),
        ],
        interpret=interpret,
    )(
        qf, qf, dof, dof, kf, kf, vf, vf, kbf, kbf,
        m, m, l, l, delta, delta, kgf, vgf, gbf,
    )

    r4 = lambda x: x.reshape(b, nh, t, dh)  # noqa: E731
    dkg = dkg[:, :g].reshape(b, nh, g, dh).astype(kg.dtype)
    dvg = dvg[:, :g].reshape(b, nh, g, dh).astype(vg.dtype)
    return r4(dq), r4(dk), r4(dv), dkg, dvg
