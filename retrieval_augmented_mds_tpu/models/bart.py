"""BART-style dense encoder-decoder (parametric-only baseline).

Rebuilds the reference's BART baseline (sotasum/bart_lightning.py:48-244:
plain seq2seq fine-tune of facebook/bart-large with CE + label smoothing).
Same block structure as LED minus the sliding-window machinery — the
encoder is dense attention (source lengths are ≤1k for this baseline).
Includes the BartLearnedPositionalEmbedding +2 offset so pretrained
weights import exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    maybe_remat,
    mha_init,
)

POS_OFFSET = 2  # BartLearnedPositionalEmbedding offset


def init_bart(key, cfg: Seq2SeqConfig) -> Params:
    ks = jax.random.split(key, 3 + cfg.enc_layers + cfg.dec_layers)
    enc = []
    for i in range(cfg.enc_layers):
        k1, k2 = jax.random.split(ks[3 + i])
        enc.append(
            {
                "attn": mha_init(k1, cfg.d_model),
                "attn_ln": layernorm_init(cfg.d_model),
                "ffn": ffn_init(k2, cfg.d_model, cfg.d_ffn),
                "ffn_ln": layernorm_init(cfg.d_model),
            }
        )
    dec = []
    for i in range(cfg.dec_layers):
        k1, k2, k3 = jax.random.split(ks[3 + cfg.enc_layers + i], 3)
        dec.append(
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
        "enc_pos": embedding_init(ks[1], cfg.max_src_len + POS_OFFSET, cfg.d_model),
        "dec_pos": embedding_init(ks[2], cfg.max_tgt_len + POS_OFFSET, cfg.d_model),
        "enc_emb_ln": layernorm_init(cfg.d_model),
        "dec_emb_ln": layernorm_init(cfg.d_model),
        "encoder": enc,
        "decoder": dec,
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def bart_encode(params, cfg: Seq2SeqConfig, ids, padding_mask, *,
                dtype=jnp.float32, remat=False):
    b, s = ids.shape
    pos = jnp.arange(s)[None, :] + POS_OFFSET
    x = embed(params["shared_emb"], ids, dtype) + embed(
        params["enc_pos"], pos, dtype
    )
    x = layernorm(params["enc_emb_ln"], x)
    mask = (padding_mask > 0)[:, None, None, :]

    def layer_fn(x, lp):
        a = attention_train(lp["attn"], x, x, cfg.n_heads,
                            key_padding_mask=padding_mask)
        x = layernorm(lp["attn_ln"], x + a)
        return layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x))

    layer_fn = maybe_remat(layer_fn, remat)
    for lp in params["encoder"]:
        x = layer_fn(x, lp)
    return x


def bart_decode(params, cfg: Seq2SeqConfig, dec_ids, enc_hidden,
                enc_padding_mask, *, caches=None, pos_offset=0,
                dtype=jnp.float32, remat=False):
    b, t = dec_ids.shape
    pos = jnp.arange(t)[None, :] + pos_offset + POS_OFFSET
    x = embed(params["shared_emb"], dec_ids, dtype) + embed(
        params["dec_pos"], pos, dtype
    )
    x = layernorm(params["dec_emb_ln"], x)
    cross_mask = (enc_padding_mask > 0)[:, None, None, :]
    new_caches = []

    def layer_fn(x, lp, cache):
        if cache is None:
            # training path: flash dense kernels (ops/flash_dense.py)
            a = attention_train(lp["self_attn"], x, x, cfg.n_heads,
                                causal=True)
            x = layernorm(lp["self_ln"], x + a)
            c = attention_train(
                lp["cross_attn"], x, enc_hidden.astype(x.dtype),
                cfg.n_heads, key_padding_mask=enc_padding_mask,
            )
            x = layernorm(lp["cross_ln"], x + c)
            return layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x)), None
        t_k = cache["k"].shape[2]
        qi = jnp.arange(t)[:, None] + cache["pos"]
        ki = jnp.arange(t_k)[None, :]
        smask = (ki <= qi)[None, None]
        a, nc = attention(lp["self_attn"], x, x, cfg.n_heads, mask=smask,
                          cache=cache)
        x = layernorm(lp["self_ln"], x + a)
        c, _ = attention(lp["cross_attn"], x, enc_hidden.astype(x.dtype),
                         cfg.n_heads, mask=cross_mask)
        x = layernorm(lp["cross_ln"], x + c)
        return layernorm(lp["ffn_ln"], x + ffn(lp["ffn"], x)), nc

    if caches is None:  # maybe_remat no-ops on falsy remat
        layer_fn = maybe_remat(layer_fn, remat)
    for li, lp in enumerate(params["decoder"]):
        x, nc = layer_fn(x, lp, caches[li] if caches is not None else None)
        new_caches.append(nc)
    return x, (new_caches if caches is not None else None)


def bart_lm_logits(params, hidden):
    logits = jnp.einsum(
        "bth,vh->btv", hidden,
        params["shared_emb"]["table"].astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits + params["final_logits_bias"][None, None, :]


def bart_params_from_hf(sd, cfg: Seq2SeqConfig) -> Params:
    """BartForConditionalGeneration state_dict → pytree."""
    from .hf_import import _dense, _emb, _ln, _t

    p: Params = {
        "shared_emb": _emb(sd, "model.shared.weight"),
        "enc_pos": _emb(sd, "model.encoder.embed_positions.weight"),
        "dec_pos": _emb(sd, "model.decoder.embed_positions.weight"),
        "enc_emb_ln": _ln(sd, "model.encoder.layernorm_embedding"),
        "dec_emb_ln": _ln(sd, "model.decoder.layernorm_embedding"),
        "final_logits_bias": jnp.asarray(_t(sd, "final_logits_bias").reshape(-1)),
    }
    enc = []
    for i in range(cfg.enc_layers):
        b = f"model.encoder.layers.{i}"
        enc.append(
            {
                "attn": {
                    "q": _dense(sd, f"{b}.self_attn.q_proj"),
                    "k": _dense(sd, f"{b}.self_attn.k_proj"),
                    "v": _dense(sd, f"{b}.self_attn.v_proj"),
                    "o": _dense(sd, f"{b}.self_attn.out_proj"),
                },
                "attn_ln": _ln(sd, f"{b}.self_attn_layer_norm"),
                "ffn": {"w1": _dense(sd, f"{b}.fc1"),
                        "w2": _dense(sd, f"{b}.fc2")},
                "ffn_ln": _ln(sd, f"{b}.final_layer_norm"),
            }
        )
    dec = []
    for i in range(cfg.dec_layers):
        b = f"model.decoder.layers.{i}"
        dec.append(
            {
                "self_attn": {
                    "q": _dense(sd, f"{b}.self_attn.q_proj"),
                    "k": _dense(sd, f"{b}.self_attn.k_proj"),
                    "v": _dense(sd, f"{b}.self_attn.v_proj"),
                    "o": _dense(sd, f"{b}.self_attn.out_proj"),
                },
                "self_ln": _ln(sd, f"{b}.self_attn_layer_norm"),
                "cross_attn": {
                    "q": _dense(sd, f"{b}.encoder_attn.q_proj"),
                    "k": _dense(sd, f"{b}.encoder_attn.k_proj"),
                    "v": _dense(sd, f"{b}.encoder_attn.v_proj"),
                    "o": _dense(sd, f"{b}.encoder_attn.out_proj"),
                },
                "cross_ln": _ln(sd, f"{b}.encoder_attn_layer_norm"),
                "ffn": {"w1": _dense(sd, f"{b}.fc1"),
                        "w2": _dense(sd, f"{b}.fc2")},
                "ffn_ln": _ln(sd, f"{b}.final_layer_norm"),
            }
        )
    p["encoder"] = enc
    p["decoder"] = dec
    return p
