"""Sliding-window + global-token attention (Longformer / LED encoder).

The one nontrivial attention pattern the reference depends on (SURVEY.md
§5.7): LED's "sliding_chunks" local attention with task-global tokens on
`<s>` and `<DOC_SEP>` (sotasum/retriever_generator.py:195-201), and
Longformer-4096 with a global `<s>` (sotasum/mips.py:124-126).

TPU-first formulation: the sequence is blocked into window-size chunks;
each query block attends its 3 neighboring key blocks (a banded matmul —
static shapes, MXU-friendly) plus up to ``max_globals`` gathered global
tokens, in one shared softmax. Global tokens run a separate dense
attention over the full sequence and overwrite their rows of the output —
HF Longformer semantics (separate q/k/v_global projections), so
pretrained weights import directly.

The dynamic set of global positions (reference masks are data-dependent)
is made static-shape by gathering the first ``max_globals`` global
positions per example — exactly the masking-at-fixed-size strategy
SURVEY.md §7.3 prescribes.

The [B, nh, T, 3w+G] logits are blocked, never [T, T]: memory is
O(T·(3w+G)) instead of O(T²).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.core import NEG_INF, Params, _merge_heads, _split_heads, dense


def sliding_attention_init(key, d_model: int) -> Params:
    from ..models.core import dense_init

    ks = jax.random.split(key, 7)
    return {
        "q": dense_init(ks[0], d_model, d_model),
        "k": dense_init(ks[1], d_model, d_model),
        "v": dense_init(ks[2], d_model, d_model),
        "qg": dense_init(ks[3], d_model, d_model),
        "kg": dense_init(ks[4], d_model, d_model),
        "vg": dense_init(ks[5], d_model, d_model),
        "o": dense_init(ks[6], d_model, d_model),
    }


def _gather_globals(global_mask: jax.Array, max_globals: int):
    """[B, T] {0,1} → (g_idx [B, G] int32, g_valid [B, G] bool).

    First G global positions per example, in position order (stable sort).
    """
    b, t = global_mask.shape
    order = jnp.argsort(-global_mask.astype(jnp.int32), axis=-1, stable=True)
    g_idx = order[:, :max_globals]
    g_valid = jnp.take_along_axis(global_mask, g_idx, axis=-1) > 0
    return g_idx.astype(jnp.int32), g_valid


def _window_kv(x: jax.Array, nb: int, w: int) -> jax.Array:
    """[B, nh, T, d] → [B, nh, nb, 3w, d]: each block with its neighbors."""
    b, nh, t, d = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (w, w), (0, 0)))
    blocks = [
        jax.lax.dynamic_slice_in_dim(xp, i * w, t, axis=2).reshape(
            b, nh, nb, w, d
        )
        for i in range(3)
    ]
    return jnp.concatenate(blocks, axis=3)


def sliding_global_attention(
    p: Params,
    x: jax.Array,  # [B, T, H]
    n_heads: int,
    window: int,
    global_mask: jax.Array,  # [B, T] {0,1}: 1 = global token
    padding_mask: jax.Array,  # [B, T] {0,1}: 1 = real token
    max_globals: int = 64,
) -> jax.Array:
    b, t, h = x.shape
    w = window
    assert t % w == 0, f"T={t} must be a multiple of window={w} (pad inputs)"
    nb = t // w
    dh = h // n_heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))

    q = _split_heads(dense(p["q"], x), n_heads)  # [B, nh, T, dh]
    k = _split_heads(dense(p["k"], x), n_heads)
    v = _split_heads(dense(p["v"], x), n_heads)

    # ----- local-query rows: band ∪ global-key columns, one softmax ------
    # Dispatched through ops/flash_sliding.sliding_local_rows: a Pallas
    # flash-style kernel on TPU (no [B, nh, nb, w, 3w] HBM logits), the
    # XLA banded composite elsewhere; backward recomputes via XLA.
    # HF semantics: global-key columns use the REGULAR k/v of the global
    # tokens; global tokens are masked out of the band (no double count);
    # *_global projections only serve the global-token rows below.
    from .flash_sliding import sliding_local_rows

    g_idx, g_valid = _gather_globals(global_mask, max_globals)  # [B, G]
    take = jax.vmap(lambda arr, idx: arr[:, idx], in_axes=(0, 0))
    kg = take(k, g_idx)  # [B, nh, G, dh]
    vg = take(v, g_idx)
    key_ok = (padding_mask > 0) & (global_mask == 0)  # [B, T]
    key_bias = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)
    g_bias = jnp.where(g_valid, 0.0, NEG_INF).astype(jnp.float32)
    out = sliding_local_rows(q, k, v, key_bias, kg, vg, g_bias, w)

    # ----- global queries attend the full sequence ------------------------
    # (query_global on global rows vs key_global/value_global on ALL
    # tokens — HF _compute_global_attn_output_from_hidden)
    kg_full = _split_heads(dense(p["kg"], x), n_heads)
    vg_full = _split_heads(dense(p["vg"], x), n_heads)
    qg_full = _split_heads(dense(p["qg"], x), n_heads)
    qg = take(qg_full, g_idx)  # [B, nh, G, dh]
    full_log = jnp.einsum(
        "bhgd,bhkd->bhgk", qg, kg_full, preferred_element_type=jnp.float32
    ) * scale  # [B, nh, G, T]
    full_log = jnp.where((padding_mask > 0)[:, None, None, :], full_log, NEG_INF)
    full_p = jax.nn.softmax(full_log, axis=-1).astype(x.dtype)
    out_g = jnp.einsum("bhgk,bhkd->bhgd", full_p, vg_full)  # [B, nh, G, dh]

    # overwrite global rows of the local output (HF semantics)
    cur = take(out, g_idx)
    mixed = jnp.where(g_valid[:, None, :, None], out_g, cur)
    scatter = jax.vmap(lambda arr, idx, val: arr.at[:, idx].set(val),
                      in_axes=(0, 0, 0))
    out = scatter(out, g_idx, mixed)

    out = jnp.where((padding_mask > 0)[:, None, :, None], out, 0.0)
    return dense(p["o"], _merge_heads(out))
