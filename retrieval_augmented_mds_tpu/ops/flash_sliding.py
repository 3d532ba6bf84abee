"""Flash-style Pallas kernel for sliding-window + global attention.

The XLA formulation (ops/sliding_attention.py) materializes the banded
logits [B, nh, nb, w, 3w] in HBM — ~1.2 GB in f32 for LED-base at 16k
tokens, measured ~16 ms/layer on v5e. This kernel computes each query
block's [w, 3w+G] logits entirely in VMEM (one grid step per (batch·head,
block)), with a single fused softmax over the band and the global-key
columns — HBM traffic drops to the q/k/v/out streams.

Scope: the *local-query* rows (the O(T) part). Global-token rows are a
tiny [G, T] dense attention computed in XLA by the caller, exactly as
before. Backward = the merged fused kernel in ops/flash_sliding_bwd.py,
fed by this forward's saved softmax stats (return_stats=True).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9
G_PAD = 128  # global-column lanes (max_globals <= 128)


def block_for(window: int) -> int:
    """Kernel tile size for a band half-width: the smallest 128-lane
    multiple >= window. The tile carries the lane-alignment requirement;
    the band mask keeps the attention reach at ±window, so sub-128
    windows (tiny test configs) run fused too."""
    return max(128, ((window + 127) // 128) * 128)


def kernel_eligible(t: int, window: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and t % block_for(window) == 0
        and not _force_xla()
    )


def _force_xla() -> bool:
    """RAMDS_FORCE_XLA_OPS=1 routes attention through the XLA composite
    even on TPU. Two uses: A/B debugging against the correctness oracle,
    and FLOP accounting — XLA's cost model reports 0 for Pallas custom
    calls, so tools/bench_train_mfu.py lowers the mathematically
    identical composite-only step to get the true numerator."""
    return os.environ.get("RAMDS_FORCE_XLA_OPS", "") == "1"


def _kernel(
    q_ref,  # [1, blk, dh]
    kp_ref, kc_ref, kn_ref,  # [1, blk, dh] key blocks j-1, j, j+1 (clamped)
    vp_ref, vc_ref, vn_ref,  # [1, blk, dh]
    kb_p_ref, kb_c_ref, kb_n_ref,  # [1, 1, blk] additive key bias (0/-inf)
    kg_ref,  # [1, G_PAD, dh] global-token keys (regular k, gathered)
    vg_ref,  # [1, G_PAD, dh]
    gb_ref,  # [1, 1, G_PAD] additive global-column bias (0 / -inf)
    out_ref,  # [1, blk, dh]
    m_ref,  # [1, 1, blk] softmax running max (saved for the fused bwd)
    l_ref,  # [1, 1, blk] softmax denominator
    *,
    w: int,  # band half-width (the attention window)
    blk: int,  # block size: the 128-lane-aligned tile, >= w
    n_blocks: int,
    dh: int,
):
    j = pl.program_id(1)
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    q = q_ref[0].astype(jnp.float32) * scale  # [blk, dh]

    q_pos = j * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)

    m = jnp.full((blk, 1), NEG_INF, jnp.float32)
    parts = []
    for t, (k_ref, kb_ref) in enumerate(
        [(kp_ref, kb_p_ref), (kc_ref, kb_c_ref), (kn_ref, kb_n_ref)]
    ):
        s = jax.lax.dot_general(
            q, k_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk, blk]
        nbr = j + t - 1
        k_pos = nbr * blk + jax.lax.broadcasted_iota(
            jnp.int32, (blk, blk), 1
        )
        ok = (
            (jnp.abs(k_pos - q_pos) <= w)
            & (k_pos >= 0)
            & (k_pos < n_blocks * blk)
        )
        s = jnp.where(ok, s + kb_ref[0, 0][None, :], NEG_INF)
        parts.append(s)
        m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))

    sg = jax.lax.dot_general(
        q, kg_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gb_ref[0, 0][None, :]  # [w, G_PAD]
    m = jnp.maximum(m, jnp.max(sg, axis=-1, keepdims=True))

    acc = jnp.zeros((blk, dh), jnp.float32)
    denom = jnp.zeros((blk, 1), jnp.float32)
    for t, v_ref in enumerate([vp_ref, vc_ref, vn_ref]):
        p = jnp.exp(parts[t] - m)
        denom = denom + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    pg = jnp.exp(sg - m)
    denom = denom + jnp.sum(pg, axis=-1, keepdims=True)
    acc = acc + jax.lax.dot_general(
        pg.astype(vg_ref.dtype), vg_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    denom = jnp.maximum(denom, 1e-30)
    out_ref[0] = (acc / denom).astype(out_ref.dtype)
    m_ref[0, 0] = m[:, 0]
    l_ref[0, 0] = denom[:, 0]


def flash_sliding_attention(
    q: jax.Array,  # [B, nh, T, dh]
    k: jax.Array,
    v: jax.Array,
    key_bias: jax.Array,  # [B, T] f32 additive (0 valid / -inf masked)
    kg: jax.Array,  # [B, nh, G, dh] gathered global-token keys
    vg: jax.Array,
    g_bias: jax.Array,  # [B, G] f32 additive (0 valid / -inf invalid)
    *,
    window: int,
    interpret: bool | None = None,
    return_stats: bool = False,
) -> jax.Array:
    """Local-query rows of sliding+global attention. Returns [B, nh, T, dh];
    with ``return_stats`` also the softmax (max m, denominator l) as
    [B*nh, 1, T] f32 — the residuals the fused backward kernel consumes
    instead of recomputing them (ops/flash_sliding_bwd.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nh, t, dh = q.shape
    w = window
    blk = block_for(w)  # 128-lane-aligned tile; band reach stays ±w
    assert t % blk == 0
    nb = t // blk
    g = kg.shape[2]
    bh = b * nh

    qf = q.reshape(bh, t, dh)
    kf = k.reshape(bh, t, dh)
    vf = v.reshape(bh, t, dh)
    kgf = jnp.zeros((bh, G_PAD, dh), kg.dtype)
    kgf = kgf.at[:, :g].set(kg.reshape(bh, g, dh))
    vgf = jnp.zeros((bh, G_PAD, dh), vg.dtype)
    vgf = vgf.at[:, :g].set(vg.reshape(bh, g, dh))
    gbf = jnp.full((b, 1, G_PAD), NEG_INF, jnp.float32)
    gbf = gbf.at[:, 0, :g].set(g_bias.astype(jnp.float32))

    def nbr(j, d):  # clamped neighbor block index
        return jnp.clip(j + d, 0, nb - 1)

    kspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, blk, dh), lambda i, j, d=d: (i, nbr(j, d), 0)
    )
    kbspec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, blk), lambda i, j, d=d: (i // nh, 0, nbr(j, d))
    )

    out, m, l = pl.pallas_call(
        functools.partial(_kernel, w=w, blk=blk, n_blocks=nb, dh=dh),
        grid=(bh, nb),
        in_specs=[
            pl.BlockSpec((1, blk, dh), lambda i, j: (i, j, 0)),
            kspec(-1), kspec(0), kspec(1),
            kspec(-1), kspec(0), kspec(1),
            kbspec(-1), kbspec(0), kbspec(1),
            pl.BlockSpec((1, G_PAD, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, G_PAD, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, G_PAD), lambda i, j: (i // nh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t * (3 * w + G_PAD) * dh * 2,
            bytes_accessed=int(bh * t * dh * 2 * 4),
            transcendentals=bh * t * (3 * w + G_PAD),
        ),
        interpret=interpret,
    )(
        qf,
        kf, kf, kf,
        vf, vf, vf,
        key_bias.astype(jnp.float32)[:, None, :],
        key_bias.astype(jnp.float32)[:, None, :],
        key_bias.astype(jnp.float32)[:, None, :],
        kgf, vgf, gbf,
    )
    out = out.reshape(b, nh, t, dh)
    if return_stats:
        return out, m, l
    return out


# ---------------------------------------------------------------------------
# XLA composite of the same local-rows math (correctness oracle + backward)
# ---------------------------------------------------------------------------

def _local_rows_xla(q, k, v, key_bias, kg, vg, g_bias, window):
    b, nh, t, dh = q.shape
    w = window
    nb = t // w
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))

    from .sliding_attention import _window_kv

    qb = q.astype(jnp.float32).reshape(b, nh, nb, w, dh) * scale
    kw = _window_kv(k.astype(jnp.float32), nb, w)
    vw = _window_kv(v, nb, w)
    band = jnp.einsum("bhnqd,bhnkd->bhnqk", qb, kw,
                      preferred_element_type=jnp.float32)
    delta = jnp.arange(3 * w)[None, :] - w - jnp.arange(w)[:, None]
    band_ok = (jnp.abs(delta) <= w)[None, None, None]
    # absolute-position validity: _window_kv zero-pads the edge blocks,
    # so slot (block n, col c) at position (n-1)*w + c must lie in [0, T)
    k_pos = (
        (jnp.arange(nb)[:, None] - 1) * w + jnp.arange(3 * w)[None, :]
    )  # [nb, 3w]
    pos_ok = ((k_pos >= 0) & (k_pos < t))[None, None, :, None, :]
    kb_w = _window_kv(key_bias[:, None, :, None].astype(jnp.float32), nb, w)[..., 0]
    band = jnp.where(
        band_ok & pos_ok, band + kb_w[:, :, :, None, :], NEG_INF
    )

    glog = jnp.einsum(
        "bhqd,bhgd->bhqg", q.astype(jnp.float32) * scale,
        kg.astype(jnp.float32), preferred_element_type=jnp.float32,
    ) + g_bias.astype(jnp.float32)[:, None, None, :]
    glog_b = glog.reshape(b, nh, nb, w, -1)

    logits = jnp.concatenate([band, glog_b], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    pb, pg = probs[..., : 3 * w], probs[..., 3 * w:]
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", pb.astype(vw.dtype), vw)
    out = out.reshape(b, nh, t, dh) + jnp.einsum(
        "bhqg,bhgd->bhqd", pg.reshape(b, nh, t, -1).astype(vg.dtype), vg
    )
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def sliding_local_rows(q, k, v, key_bias, kg, vg, g_bias, window):
    """Local-query rows; Pallas kernels on TPU (any window: the tile is
    lane-aligned by block_for, the band mask keeps the ±window reach),
    XLA composite elsewhere and whenever T doesn't tile."""
    if kernel_eligible(q.shape[2], window):
        return flash_sliding_attention(
            q, k, v, key_bias, kg, vg, g_bias, window=window
        )
    return _local_rows_xla(q, k, v, key_bias, kg, vg, g_bias, window)


def _fwd(q, k, v, key_bias, kg, vg, g_bias, window):
    if kernel_eligible(q.shape[2], window):
        out, m, l = flash_sliding_attention(
            q, k, v, key_bias, kg, vg, g_bias, window=window,
            return_stats=True,
        )
        # out is a residual: delta = rowsum(do * out) replaces the
        # backward's p*dp reduction (FlashAttention-2 identity)
        return out, (q, k, v, key_bias, kg, vg, g_bias, out, m, l)
    out = _local_rows_xla(q, k, v, key_bias, kg, vg, g_bias, window)
    return out, (q, k, v, key_bias, kg, vg, g_bias, None, None, None)


def _bwd(window, res, g):
    q, k, v, key_bias, kg, vg, g_bias, out, m, l = res
    if out is not None:
        from .flash_sliding_bwd import flash_sliding_backward

        b, nh, t, _ = q.shape
        delta = jnp.sum(
            g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        ).reshape(b * nh, 1, t)
        dq, dk, dv, dkg, dvg = flash_sliding_backward(
            q, k, v, key_bias, kg, vg, g_bias, g, m, l, delta,
            window=window,
        )
        return (
            dq, dk, dv, jnp.zeros_like(key_bias), dkg, dvg,
            jnp.zeros_like(g_bias),
        )
    _, vjp = jax.vjp(
        lambda a, b_, c, d_, e: _local_rows_xla(
            a, b_, c, key_bias, d_, e, g_bias, window
        ),
        q, k, v, kg, vg,
    )
    dq, dk, dv, dkg, dvg = vjp(g)
    # masks carry no gradient on ANY path (kernel parity of conventions)
    return (dq, dk, dv, jnp.zeros_like(key_bias), dkg, dvg,
            jnp.zeros_like(g_bias))


sliding_local_rows.defvjp(_fwd, _bwd)
