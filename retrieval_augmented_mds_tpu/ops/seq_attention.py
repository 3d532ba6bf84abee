"""Sequence-parallel sliding-window + global attention (context/sequence
parallelism for long-document encoders).

SURVEY.md §2.2 lists the sequence-sharding story for the 16k-token LED
encoder as an owed TPU-native capability (the reference handles long
context only at the model level via Longformer sparsity; it has no
sequence parallelism to copy). The sliding-window structure makes true
sequence sharding cheap on a TPU mesh:

  * tokens are sharded contiguously over a mesh axis — each device holds
    a [B, T/s, H] block and computes its own q/k/v projections (weights
    replicated, one big local matmul on the MXU);
  * the attention band only reaches w tokens past the block edge, so the
    K/V halo is two `ppermute` exchanges of a [B, nh, w, dh] edge slice
    over ICI — O(w), independent of T;
  * the banded softmax reuses `ops.flash_sliding.sliding_local_rows`
    unchanged (Pallas kernel on TPU): the local block is extended with
    the halos and w dummy query rows that are sliced off after the call;
  * global tokens (G ≤ max_globals, the `<s>`/`<DOC_SEP>` set): their
    regular K/V rows and global-q rows are collected with G-sized
    `psum`s (each owner contributes, everyone receives);
  * global-query rows attend the FULL sequence without ever gathering
    it: each shard computes a partial (max, sum, weighted-value) triple
    over its local keys and the triples are combined with `pmax`/`psum`
    — a cross-device flash softmax, O(G·dh) on the wire;
  * padding/global masks are replicated (tiny [B, T] int arrays), so
    every edge bias is sliced locally — no mask communication at all.

Communication total per layer: 4 ppermutes of w-wide edges + a handful
of G-sized psums — all O(w + G), never O(T).

Numerics match `ops.sliding_attention.sliding_global_attention` exactly
(same composite, same one-softmax band∪global semantics; parity test in
tests/test_seq_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.core import NEG_INF, Params, _merge_heads, _split_heads, dense
from .flash_sliding import sliding_local_rows
from .sliding_attention import _gather_globals


def _take_rows(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr [B, nh, T, d], idx [B, G] → [B, G? no: [B, nh, G, d]]."""
    return jax.vmap(lambda a, i: a[:, i], in_axes=(0, 0))(arr, idx)


def _local_attention(
    p: Params,
    xl: jax.Array,  # [B, Tl, H] this shard's token block
    global_mask: jax.Array,  # [B, T] replicated
    padding_mask: jax.Array,  # [B, T] replicated
    *,
    n_heads: int,
    window: int,
    max_globals: int,
    axis: str,
    n_shards: int,
):
    b, tl, h = xl.shape
    w = window
    dh = h // n_heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    idx = jax.lax.axis_index(axis)
    off = idx * tl

    q = _split_heads(dense(p["q"], xl), n_heads)  # [B, nh, Tl, dh]
    k = _split_heads(dense(p["k"], xl), n_heads)
    v = _split_heads(dense(p["v"], xl), n_heads)

    # ----- replicated global bookkeeping (masks are tiny) ----------------
    g_idx, g_valid = _gather_globals(global_mask, max_globals)  # [B, G]
    key_ok = (padding_mask > 0) & (global_mask == 0)
    key_bias_full = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)
    g_bias = jnp.where(g_valid, 0.0, NEG_INF).astype(jnp.float32)

    # ----- K/V halo exchange over ICI ------------------------------------
    # devices with no source (sequence edges) receive zeros; the bias
    # slice below (NEG_INF outside [0, T)) masks those rows out.
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]
    k_lo = jax.lax.ppermute(k[:, :, -w:], axis, right)  # from left nbr
    k_hi = jax.lax.ppermute(k[:, :, :w], axis, left)  # from right nbr
    v_lo = jax.lax.ppermute(v[:, :, -w:], axis, right)
    v_hi = jax.lax.ppermute(v[:, :, :w], axis, left)
    k_ext = jnp.concatenate([k_lo, k, k_hi], axis=2)  # [B, nh, Tl+2w, dh]
    v_ext = jnp.concatenate([v_lo, v, v_hi], axis=2)

    kb_pad = jnp.pad(key_bias_full, ((0, 0), (w, w)), constant_values=NEG_INF)
    key_bias_ext = jax.lax.dynamic_slice(
        kb_pad, (0, off), (b, tl + 2 * w)
    )  # ext coords: local position j ↔ ext position j + w

    # ----- global K/V (regular projections) via G-sized psum -------------
    pos = g_idx - off  # [B, G] position in this shard's block
    own = (pos >= 0) & (pos < tl) & g_valid
    safe = jnp.clip(pos, 0, tl - 1)
    own_f = own[:, None, :, None]
    kg = jax.lax.psum(_take_rows(k, safe) * own_f, axis)  # [B, nh, G, dh]
    vg = jax.lax.psum(_take_rows(v, safe) * own_f, axis)

    # ----- local rows: extended-block banded softmax ---------------------
    # w dummy query rows on each side keep the band aligned with k_ext;
    # their outputs are sliced off. Reuses the Pallas kernel on TPU.
    q_ext = jnp.pad(q, ((0, 0), (0, 0), (w, w), (0, 0)))
    out_ext = sliding_local_rows(
        q_ext, k_ext, v_ext, key_bias_ext, kg, vg, g_bias, w
    )
    out = out_ext[:, :, w : w + tl]  # [B, nh, Tl, dh]

    # ----- global rows: cross-device flash softmax over the full seq -----
    kgf = _split_heads(dense(p["kg"], xl), n_heads)  # [B, nh, Tl, dh]
    vgf = _split_heads(dense(p["vg"], xl), n_heads)
    qgf = _split_heads(dense(p["qg"], xl), n_heads)
    qg = jax.lax.psum(_take_rows(qgf, safe) * own_f, axis)  # [B, nh, G, dh]

    pad_bias_l = jax.lax.dynamic_slice(
        jnp.where(padding_mask > 0, 0.0, NEG_INF).astype(jnp.float32),
        (0, off), (b, tl),
    )  # [B, Tl]
    logit = jnp.einsum(
        "bhgd,bhkd->bhgk", qg.astype(jnp.float32) * scale,
        kgf.astype(jnp.float32), preferred_element_type=jnp.float32,
    ) + pad_bias_l[:, None, None, :]  # [B, nh, G, Tl]
    # flash-style shift: the max is a pure numerical stabilizer, so it
    # carries no gradient (stop_gradient); pmax has no VJP rule, so the
    # global max rides a G-sized all_gather instead
    m_l = jax.lax.stop_gradient(jnp.max(logit, axis=-1))  # [B, nh, G]
    p_l = jnp.exp(logit - m_l[..., None])
    s_l = jnp.sum(p_l, axis=-1)
    o_l = jnp.einsum("bhgk,bhkd->bhgd", p_l, vgf.astype(jnp.float32))
    m_g = jax.lax.stop_gradient(
        jnp.max(jax.lax.all_gather(m_l, axis), axis=0)
    )
    corr = jnp.exp(m_l - m_g)
    s = jax.lax.psum(s_l * corr, axis)
    o = jax.lax.psum(o_l * corr[..., None], axis)
    out_g = (o / jnp.maximum(s, 1e-30)[..., None]).astype(out.dtype)

    # overwrite the global rows this shard owns (OOB dest = dropped)
    dest = jnp.where(own, safe, tl)
    out = jax.vmap(
        lambda a, i, val: a.at[:, i].set(val, mode="drop"),
        in_axes=(0, 0, 0),
    )(out, dest, out_g)

    pmask_l = jax.lax.dynamic_slice(padding_mask, (0, off), (b, tl))
    out = jnp.where((pmask_l > 0)[:, None, :, None], out, 0.0)
    return dense(p["o"], _merge_heads(out))


def sliding_global_attention_seqsharded(
    p: Params,
    x: jax.Array,  # [B, T, H] sharded (or shardable) over the seq axis
    n_heads: int,
    window: int,
    global_mask: jax.Array,  # [B, T]
    padding_mask: jax.Array,  # [B, T]
    max_globals: int,
    mesh,
    axis: str = "shard",
) -> jax.Array:
    """Drop-in sequence-parallel variant of `sliding_global_attention`:
    same params, same semantics, T sharded over ``mesh`` axis ``axis``.
    Composes with data parallelism: the batch dimension is sharded over
    the mesh's ``data`` axis (replicated when that axis has size 1)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_shards = mesh.shape[axis]
    t = x.shape[1]
    tl = t // n_shards
    assert t % n_shards == 0 and tl % window == 0, (
        f"T={t} must split into {n_shards} blocks of a multiple of "
        f"window={window}"
    )
    da = DATA_AXIS if DATA_AXIS in mesh.shape else None
    fn = jax.shard_map(
        functools.partial(
            _local_attention, n_heads=n_heads, window=window,
            max_globals=max_globals, axis=axis, n_shards=n_shards,
        ),
        mesh=mesh,
        in_specs=(P(), P(da, axis, None), P(da, None), P(da, None)),
        out_specs=P(da, axis, None),
    )
    return fn(p, x, global_mask, padding_mask)
