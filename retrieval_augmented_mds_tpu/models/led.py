"""LED-style encoder-decoder (the generator backbone).

Replaces `LEDForConditionalGeneration` (wrapped by the reference at
sotasum/retriever_generator.py:250-253): a sliding-window + global
attention encoder over up to 16k source tokens, and a standard causal
decoder with cross-attention and a KV cache for incremental decoding.
BART-family post-LN blocks; embeddings shared between encoder, decoder,
and the LM head (tied output projection + final logits bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sliding_attention import (
    sliding_attention_init,
    sliding_global_attention,
)
from .config import Seq2SeqConfig
from .core import (
    Params,
    attention,
    attention_train,
    embed,
    embedding_init,
    ffn,
    ffn_init,
    layernorm,
    layernorm_init,
    make_cache,
    maybe_remat,
    mha_init,
    precompute_cross_kv,
)


def init_led(key, cfg: Seq2SeqConfig) -> Params:
    ks = jax.random.split(key, 5 + cfg.enc_layers + cfg.dec_layers)
    enc_layers = []
    for i in range(cfg.enc_layers):
        k1, k2 = jax.random.split(ks[5 + i])
        enc_layers.append(
            {
                "attn": sliding_attention_init(k1, cfg.d_model),
                "attn_ln": layernorm_init(cfg.d_model),
                "ffn": ffn_init(k2, cfg.d_model, cfg.d_ffn),
                "ffn_ln": layernorm_init(cfg.d_model),
            }
        )
    dec_layers = []
    for i in range(cfg.dec_layers):
        k1, k2, k3 = jax.random.split(ks[5 + cfg.enc_layers + i], 3)
        dec_layers.append(
            {
                "self_attn": mha_init(k1, cfg.d_model),
                "self_ln": layernorm_init(cfg.d_model),
                "cross_attn": mha_init(k2, cfg.d_model),
                "cross_ln": layernorm_init(cfg.d_model),
                "ffn": ffn_init(k3, cfg.d_model, cfg.d_ffn),
                "ffn_ln": layernorm_init(cfg.d_model),
            }
        )
    return {
        "shared_emb": embedding_init(ks[0], cfg.vocab_size, cfg.d_model),
        "enc_pos": embedding_init(ks[1], cfg.max_src_len, cfg.d_model),
        "dec_pos": embedding_init(ks[2], cfg.max_tgt_len, cfg.d_model),
        "enc_emb_ln": layernorm_init(cfg.d_model),
        "dec_emb_ln": layernorm_init(cfg.d_model),
        "encoder": enc_layers,
        "decoder": dec_layers,
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def led_encode(
    params: Params,
    cfg: Seq2SeqConfig,
    ids: jax.Array,  # [B, S]
    padding_mask: jax.Array,  # [B, S]
    global_mask: jax.Array | None = None,
    *,
    dtype=jnp.float32,
    remat: bool | str = False,
    seq_mesh=None,  # sequence parallelism over the mesh "shard" axis
) -> jax.Array:
    """16k-token LED encoder; with ``seq_mesh`` the sequence dimension is
    sharded over the mesh (ops/seq_attention.py — SURVEY.md §2.2's owed
    sequence-sharding story; the reference has no equivalent)."""
    b, s = ids.shape
    if global_mask is None:
        global_mask = jnp.zeros_like(padding_mask).at[:, 0].set(1)
    global_mask = global_mask * padding_mask
    pos = jnp.arange(s)[None, :]
    x = embed(params["shared_emb"], ids, dtype) + embed(
        params["enc_pos"], pos, dtype
    )
    x = layernorm(params["enc_emb_ln"], x)

    if seq_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.seq_attention import sliding_global_attention_seqsharded
        from ..parallel.mesh import DATA_AXIS, SHARD_AXIS

        da = DATA_AXIS if DATA_AXIS in seq_mesh.shape else None
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(seq_mesh, P(da, SHARD_AXIS, None))
        )

    def layer_fn(x, lp):
        if seq_mesh is not None:
            a = sliding_global_attention_seqsharded(
                lp["attn"], x, cfg.n_heads, cfg.window, global_mask,
                padding_mask, cfg.max_globals, seq_mesh,
            )
        else:
            a = sliding_global_attention(
                lp["attn"], x, cfg.n_heads, cfg.window, global_mask,
                padding_mask, cfg.max_globals,
            )
        x = layernorm(lp["attn_ln"], x + a)
        return layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x))

    layer_fn = maybe_remat(layer_fn, remat)
    for lp in params["encoder"]:
        x = layer_fn(x, lp)
    return x


def led_decode(
    params: Params,
    cfg: Seq2SeqConfig,
    dec_ids: jax.Array,  # [B, T]
    enc_hidden: jax.Array,  # [B, S, H]
    enc_padding_mask: jax.Array,  # [B, S]
    *,
    caches: list[Params] | None = None,  # per-layer self-attn caches
    pos_offset=0,  # decode position of dec_ids[:, 0]
    dtype=jnp.float32,
    remat: bool | str = False,
):
    """Returns (hidden [B, T, H], new_caches).

    With ``caches``, runs incrementally: dec_ids is the new chunk and each
    layer's KV cache is appended (jit-stable shapes for beam decoding).
    """
    b, t = dec_ids.shape
    pos = jnp.arange(t)[None, :] + pos_offset
    x = embed(params["shared_emb"], dec_ids, dtype) + embed(
        params["dec_pos"], pos, dtype
    )
    x = layernorm(params["dec_emb_ln"], x)

    cross_mask = (enc_padding_mask > 0)[:, None, None, :]
    new_caches = []

    def layer_fn(x, lp, cache):
        if cache is None:
            # training path: flash dense kernels (ops/flash_dense.py) —
            # no [B, nh, T, S] residuals saved for backward
            a = attention_train(lp["self_attn"], x, x, cfg.n_heads,
                                causal=True)
            x = layernorm(lp["self_ln"], x + a)
            c = attention_train(
                lp["cross_attn"], x, enc_hidden.astype(x.dtype),
                cfg.n_heads, key_padding_mask=enc_padding_mask,
            )
            x = layernorm(lp["cross_ln"], x + c)
            x = layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x))
            return x, None
        t_k = cache["k"].shape[2]
        qi = jnp.arange(t)[:, None] + cache["pos"]
        ki = jnp.arange(t_k)[None, :]
        smask = (ki <= qi)[None, None]
        a, new_cache = attention(
            lp["self_attn"], x, x, cfg.n_heads, mask=smask, cache=cache
        )
        x = layernorm(lp["self_ln"], x + a)
        ckv = None
        if "ck" in cache:
            ckv = (cache["ck"], cache["cv"])
        c, _ = attention(
            lp["cross_attn"], x, enc_hidden.astype(x.dtype), cfg.n_heads,
            mask=cross_mask, kv=ckv,
        )
        if new_cache is not None and ckv is not None:
            new_cache = dict(new_cache, ck=cache["ck"], cv=cache["cv"])
        x = layernorm(lp["cross_ln"], x + c)
        x = layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x))
        return x, new_cache

    if caches is None:  # maybe_remat no-ops on falsy remat
        layer_fn = maybe_remat(layer_fn, remat)
    for li, lp in enumerate(params["decoder"]):
        cache = caches[li] if caches is not None else None
        x, nc = layer_fn(x, lp, cache)
        new_caches.append(nc)
    return x, (new_caches if caches is not None else None)


def led_lm_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """Tied-embedding LM head: [B, T, H] → [B, T, V] (f32)."""
    logits = jnp.einsum(
        "bth,vh->btv",
        hidden,
        params["shared_emb"]["table"].astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits + params["final_logits_bias"][None, None, :]


def init_decode_caches(
    params: Params, cfg: Seq2SeqConfig, b: int, t_max: int, dtype=jnp.float32,
    enc_hidden: jax.Array | None = None,
) -> list[Params]:
    """Self-attention KV caches; with ``enc_hidden``, also precompute the
    per-layer cross-attention K/V once (reused every decode step)."""
    dh = cfg.d_model // cfg.n_heads
    caches = []
    for lp in params["decoder"]:
        c = make_cache(b, cfg.n_heads, dh, t_max, dtype)
        if enc_hidden is not None:
            ck, cv = precompute_cross_kv(
                lp["cross_attn"], enc_hidden.astype(dtype), cfg.n_heads
            )
            c = dict(c, ck=ck, cv=cv)
        caches.append(c)
    return caches


def shift_tokens_right(ids: jax.Array, pad_id: int, start_id: int):
    """Teacher-forcing decoder inputs (HF `shift_tokens_right` semantics,
    used by the reference at sotasum/lightning_model.py:218-220)."""
    shifted = jnp.roll(ids, 1, axis=-1).at[:, 0].set(start_id)
    return jnp.where(shifted == -100, pad_id, shifted)
