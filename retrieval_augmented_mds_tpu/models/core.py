"""Pure-JAX transformer building blocks.

Replaces the torch/HF module stack (SURVEY.md §2.3 #4). Parameters are
nested dicts of arrays (pytrees) — trivially shardable with pjit and
checkpointable with orbax — and every forward is a pure function, so
`jax.jit` / `jax.grad` / `jax.checkpoint` compose freely.

Conventions: activations [B, T, H]; params f32; matmuls run in the
caller-chosen compute dtype (bf16 on TPU) with f32 accumulation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

NEG_INF = -1e9  # softmax mask value (finite: avoids NaN on all-masked rows)


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def dense_init(key, d_in: int, d_out: int, scale: float = 0.02) -> Params:
    return {
        "kernel": scale * jax.random.normal(key, (d_in, d_out), jnp.float32),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def layernorm_init(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def embedding_init(key, vocab: int, d: int, scale: float = 0.02) -> Params:
    return {"table": scale * jax.random.normal(key, (vocab, d), jnp.float32)}


def mha_init(key, d_model: int, d_kv: int | None = None) -> Params:
    d_kv = d_kv or d_model
    ks = jax.random.split(key, 4)
    return {
        "q": dense_init(ks[0], d_model, d_model),
        "k": dense_init(ks[1], d_kv, d_model),
        "v": dense_init(ks[2], d_kv, d_model),
        "o": dense_init(ks[3], d_model, d_model),
    }


def ffn_init(key, d_model: int, d_ffn: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"w1": dense_init(k1, d_model, d_ffn),
            "w2": dense_init(k2, d_ffn, d_model)}


# ---------------------------------------------------------------------------
# forward primitives
# ---------------------------------------------------------------------------

def maybe_remat(fn, remat):
    """Per-layer gradient checkpointing (reference model_config.py:35
    `gradient_checkpointing`). ``remat`` is False (off), True/"full"
    (recompute everything), or the name of a `jax.checkpoint_policies`
    entry — e.g. "dots_with_no_batch_dims_saveable" keeps matmul outputs
    resident and recomputes only the cheap elementwise/attention
    internals, an HBM/FLOPs middle ground for large batches."""
    if not remat:
        return fn
    policy = None
    if isinstance(remat, str) and remat != "full":
        policy = getattr(jax.checkpoint_policies, remat, None)
        if policy is None:
            valid = [n for n in dir(jax.checkpoint_policies)
                     if not n.startswith("_")]
            raise ValueError(
                f"train.remat={remat!r} is not a jax.checkpoint_policies "
                f"name (or true/'full'); choices: {valid}"
            )
    return jax.checkpoint(fn, policy=policy)


def dense(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    dtype = dtype or x.dtype
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(dtype)


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def embed(p: Params, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    return jnp.take(p["table"], ids, axis=0).astype(dtype)


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, t, h = x.shape
    return x.reshape(b, t, n_heads, h // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, nh, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, nh * dh)


def _fold_groups(q: jax.Array, g: int) -> jax.Array:
    """[b·g, nh, t, dh] → [b, nh, g·t, dh] (row b·g-major order kept).

    Beam decoding trick: beams are query-side only — the encoder states,
    their K/V projections, and the retrieved memory are identical across a
    batch item's beams. Folding the beam axis into the query time axis lets
    attention run against UN-expanded [b, ...] K/V: per-step HBM traffic
    drops by the beam factor and the beam-reorder gather never has to touch
    encoder-side tensors (the torch reference instead `index_select`s the
    beam-expanded memory every step, retriever_generator.py:297-344)."""
    bg, nh, t, dh = q.shape
    b = bg // g
    return q.reshape(b, g, nh, t, dh).transpose(0, 2, 1, 3, 4).reshape(
        b, nh, g * t, dh
    )


def _unfold_groups(o: jax.Array, g: int) -> jax.Array:
    """Inverse of `_fold_groups`: [b, nh, g·t, dh] → [b·g, nh, t, dh]."""
    b, nh, gt, dh = o.shape
    t = gt // g
    return o.reshape(b, nh, g, t, dh).transpose(0, 2, 1, 3, 4).reshape(
        b * g, nh, t, dh
    )


def attention(
    p: Params,
    x_q: jax.Array,  # [B, Tq, H]
    x_kv: jax.Array,  # [B, Tk, Hkv]
    n_heads: int,
    *,
    mask: jax.Array | None = None,  # broadcastable to [B, 1|nh, Tq, Tk]; True=keep
    bias: jax.Array | None = None,  # additive logits bias, same broadcast
    cache: Params | None = None,  # {"k","v" [B, nh, Tmax, dh], "pos" []}
    kv: tuple[jax.Array, jax.Array] | None = None,  # precomputed k/v heads
) -> tuple[jax.Array, Params | None]:
    """Multi-head attention. With ``cache``, x_kv is the *new* kv chunk to
    append at cache["pos"] (incremental decode); mask then applies over the
    full cached length. With ``kv``, the key/value projections are reused
    (cross-attention during incremental decode — computed once, not per
    step). When the q batch is a multiple of the kv batch (beam decoding
    against un-expanded encoder K/V), beams are folded into the query time
    axis — see `_fold_groups`; ``mask``/``bias`` must then be batched at
    the kv batch size (or broadcastable)."""
    dh = p["q"]["kernel"].shape[1] // n_heads
    q = _split_heads(dense(p["q"], x_q), n_heads)
    if kv is not None:
        k, v = kv
    else:
        k = _split_heads(dense(p["k"], x_kv), n_heads)
        v = _split_heads(dense(p["v"], x_kv), n_heads)

    if cache is not None:
        pos = cache["pos"]
        k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                         (0, 0, pos, 0))
        v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                         (0, 0, pos, 0))
        cache = {"k": k, "v": v, "pos": pos + x_kv.shape[1]}

    g = 1
    if k.shape[0] != q.shape[0]:
        assert q.shape[0] % k.shape[0] == 0, (q.shape, k.shape)
        g = q.shape[0] // k.shape[0]
        q = _fold_groups(q, g)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(dh))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(x_q.dtype))
    if g > 1:
        out = _unfold_groups(out, g)
    return dense(p["o"], _merge_heads(out)), cache


def attention_train(
    p: Params,
    x_q: jax.Array,  # [B, Tq, H]
    x_kv: jax.Array,  # [B, Tk, H]
    n_heads: int,
    *,
    key_padding_mask: jax.Array | None = None,  # [B, Tk] {0,1}
    causal: bool = False,
) -> jax.Array:
    """Training-time dense attention (no cache / precomputed kv / beam
    fold) routed through the flash decoder kernel (ops/flash_dense.py)
    on TPU: nothing [B, nh, Tq, Tk]-shaped is materialized or saved for
    backward. Off-TPU and at kernel-ineligible shapes this is exactly
    `attention`'s math (the XLA composite inside dense_rows)."""
    from ..ops.flash_dense import dense_rows

    q = _split_heads(dense(p["q"], x_q), n_heads)
    k = _split_heads(dense(p["k"], x_kv), n_heads)
    v = _split_heads(dense(p["v"], x_kv), n_heads)
    b, s = x_kv.shape[0], x_kv.shape[1]
    if key_padding_mask is None:
        kb = jnp.zeros((b, s), jnp.float32)
    else:
        kb = jnp.where(key_padding_mask > 0, 0.0, NEG_INF).astype(
            jnp.float32
        )
    out = dense_rows(q, k, v, kb, causal)
    return dense(p["o"], _merge_heads(out))


def ffn(p: Params, x: jax.Array) -> jax.Array:
    return dense(p["w2"], jax.nn.gelu(dense(p["w1"], x)))


def make_cache(b: int, n_heads: int, dh: int, t_max: int, dtype) -> Params:
    return {
        "k": jnp.zeros((b, n_heads, t_max, dh), dtype),
        "v": jnp.zeros((b, n_heads, t_max, dh), dtype),
        "pos": jnp.int32(0),
    }


def precompute_cross_kv(p: Params, enc_hidden: jax.Array, n_heads: int):
    """One-time cross-attention K/V projection of the encoder states
    (HF past_key_values cross entries; saves S·H² matmuls per decode
    step)."""
    return (
        _split_heads(dense(p["k"], enc_hidden), n_heads),
        _split_heads(dense(p["v"], enc_hidden), n_heads),
    )


def causal_mask(t_q: int, t_k: int, offset) -> jax.Array:
    """[1, 1, Tq, Tk] causal mask where query i sits at position offset+i."""
    qi = jnp.arange(t_q)[:, None] + offset
    ki = jnp.arange(t_k)[None, :]
    return (ki <= qi)[None, None]
