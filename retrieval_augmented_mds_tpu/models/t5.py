"""T5-style encoder-decoder (prompted baseline).

Rebuilds the reference's T5 baseline (sotasum/t5_lightning.py:48-232:
"summarize: "-prefixed fine-tune of t5-large with `_shift_right` decoder
inputs). T5 differs from the BART family everywhere it counts: RMSNorm
pre-LN blocks, no positional embeddings (bucketed relative position bias
shared from layer 0 of each stack), unscaled attention logits, ReLU FFN,
and a d_model^-0.5 rescale before the tied LM head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import Seq2SeqConfig
from .core import (NEG_INF, Params, _merge_heads, _split_heads,
                   embedding_init, maybe_remat)

N_BUCKETS = 32
MAX_DISTANCE = 128


def _rms_init(d):
    return {"scale": jnp.ones((d,), jnp.float32)}


def rmsnorm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * p["scale"]).astype(x.dtype)


def _linear_init(key, d_in, d_out):
    return {"kernel": 0.02 * jax.random.normal(key, (d_in, d_out), jnp.float32)}


def _linear(p, x):
    return jnp.dot(x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _attn_init(key, d):
    ks = jax.random.split(key, 4)
    return {name: _linear_init(k, d, d) for name, k in zip("qkvo", ks)}


def _ffn_init(key, d, dff):
    k1, k2 = jax.random.split(key)
    return {"wi": _linear_init(k1, d, dff), "wo": _linear_init(k2, dff, d)}


def relative_position_bucket(rel, bidirectional: bool):
    """HF T5 bucketing (num_buckets=32, max_distance=128)."""
    nb = N_BUCKETS
    ret = jnp.zeros_like(rel)
    if bidirectional:
        nb //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * nb
        n = jnp.abs(rel)
    else:
        n = jnp.maximum(-rel, 0)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(MAX_DISTANCE / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return ret + jnp.where(is_small, n, large)


def _pos_bias(table, t_q, t_k, bidirectional, offset=0):
    """[1, nh, Tq, Tk] bias from the layer-0 relative_attention_bias."""
    ctx = jnp.arange(t_q)[:, None] + offset
    mem = jnp.arange(t_k)[None, :]
    bucket = relative_position_bucket(mem - ctx, bidirectional)
    return jnp.take(table, bucket, axis=0).transpose(2, 0, 1)[None]


def _t5_attention(p, x_q, x_kv, n_heads, bias=None, mask=None, cache=None):
    """Unscaled multi-head attention with additive position bias."""
    q = _split_heads(_linear(p["q"], x_q), n_heads)
    k = _split_heads(_linear(p["k"], x_kv), n_heads)
    v = _split_heads(_linear(p["v"], x_kv), n_heads)
    if cache is not None:
        pos = cache["pos"]
        k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                         (0, 0, pos, 0))
        v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                         (0, 0, pos, 0))
        cache = {"k": k, "v": v, "pos": pos + x_kv.shape[1]}
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(x_q.dtype))
    return _linear(p["o"], _merge_heads(out)), cache


def init_t5(key, cfg: Seq2SeqConfig) -> Params:
    ks = jax.random.split(key, 4 + cfg.enc_layers + cfg.dec_layers)
    nh = cfg.n_heads
    enc = []
    for i in range(cfg.enc_layers):
        k1, k2 = jax.random.split(ks[4 + i])
        enc.append(
            {
                "attn": _attn_init(k1, cfg.d_model),
                "attn_ln": _rms_init(cfg.d_model),
                "ffn": _ffn_init(k2, cfg.d_model, cfg.d_ffn),
                "ffn_ln": _rms_init(cfg.d_model),
            }
        )
    dec = []
    for i in range(cfg.dec_layers):
        k1, k2, k3 = jax.random.split(ks[4 + cfg.enc_layers + i], 3)
        dec.append(
            {
                "self_attn": _attn_init(k1, cfg.d_model),
                "self_ln": _rms_init(cfg.d_model),
                "cross_attn": _attn_init(k2, cfg.d_model),
                "cross_ln": _rms_init(cfg.d_model),
                "ffn": _ffn_init(k3, cfg.d_model, cfg.d_ffn),
                "ffn_ln": _rms_init(cfg.d_model),
            }
        )
    return {
        "shared_emb": embedding_init(ks[0], cfg.vocab_size, cfg.d_model),
        "enc_rel_bias": 0.02 * jax.random.normal(ks[1], (N_BUCKETS, nh)),
        "dec_rel_bias": 0.02 * jax.random.normal(ks[2], (N_BUCKETS, nh)),
        "enc_final_ln": _rms_init(cfg.d_model),
        "dec_final_ln": _rms_init(cfg.d_model),
        "encoder": enc,
        "decoder": dec,
    }


def t5_encode(params, cfg: Seq2SeqConfig, ids, padding_mask, *,
              dtype=jnp.float32, remat=False):
    from .core import embed

    b, s = ids.shape
    x = embed(params["shared_emb"], ids, dtype)
    bias = _pos_bias(params["enc_rel_bias"], s, s, bidirectional=True)
    mask = (padding_mask > 0)[:, None, None, :]

    def layer_fn(x, lp):
        xn = rmsnorm(lp["attn_ln"], x)
        a, _ = _t5_attention(lp["attn"], xn, xn, cfg.n_heads, bias=bias,
                             mask=mask)
        x = x + a
        xn = rmsnorm(lp["ffn_ln"], x)
        f = _linear(lp["ffn"]["wo"], jax.nn.relu(_linear(lp["ffn"]["wi"], xn)))
        return x + f

    layer_fn = maybe_remat(layer_fn, remat)
    for lp in params["encoder"]:
        x = layer_fn(x, lp)
    return rmsnorm(params["enc_final_ln"], x)


def t5_decode(params, cfg: Seq2SeqConfig, dec_ids, enc_hidden,
              enc_padding_mask, *, caches=None, pos_offset=0,
              dtype=jnp.float32):
    from .core import embed

    b, t = dec_ids.shape
    x = embed(params["shared_emb"], dec_ids, dtype)
    cross_mask = (enc_padding_mask > 0)[:, None, None, :]
    new_caches = []
    for li, lp in enumerate(params["decoder"]):
        cache = caches[li] if caches is not None else None
        if cache is not None:
            t_k = cache["k"].shape[2]
            qi = jnp.arange(t)[:, None] + cache["pos"]
            ki = jnp.arange(t_k)[None, :]
            smask = (ki <= qi)[None, None]
            bias = _pos_bias(params["dec_rel_bias"], t, t_k,
                             bidirectional=False, offset=cache["pos"])
        else:
            qi = jnp.arange(t)[:, None]
            smask = (jnp.arange(t)[None, :] <= qi)[None, None]
            bias = _pos_bias(params["dec_rel_bias"], t, t,
                             bidirectional=False, offset=pos_offset)
        xn = rmsnorm(lp["self_ln"], x)
        a, nc = _t5_attention(lp["self_attn"], xn, xn, cfg.n_heads,
                              bias=bias, mask=smask, cache=cache)
        x = x + a
        xn = rmsnorm(lp["cross_ln"], x)
        c, _ = _t5_attention(lp["cross_attn"], xn,
                             enc_hidden.astype(x.dtype), cfg.n_heads,
                             mask=cross_mask)
        x = x + c
        xn = rmsnorm(lp["ffn_ln"], x)
        x = x + _linear(lp["ffn"]["wo"],
                        jax.nn.relu(_linear(lp["ffn"]["wi"], xn)))
        new_caches.append(nc)
    x = rmsnorm(params["dec_final_ln"], x)
    return x, (new_caches if caches is not None else None)


def t5_lm_logits(params, hidden, cfg: Seq2SeqConfig):
    """Tied head with the d_model^-0.5 rescale (tie_word_embeddings)."""
    h = hidden * (cfg.d_model ** -0.5)
    return jnp.einsum("bth,vh->btv", h,
                      params["shared_emb"]["table"].astype(h.dtype),
                      preferred_element_type=jnp.float32)


def t5_shift_right(ids, pad_id: int, start_id: int = 0):
    """T5 `_shift_right` (reference sotasum/t5_lightning.py:93-101)."""
    shifted = jnp.roll(ids, 1, axis=-1).at[:, 0].set(start_id)
    return jnp.where(shifted == -100, pad_id, shifted)


def t5_params_from_hf(sd, cfg: Seq2SeqConfig) -> Params:
    from .hf_import import _t

    def lin(prefix):
        return {"kernel": jnp.asarray(_t(sd, prefix + ".weight").T)}

    def rms(prefix):
        return {"scale": jnp.asarray(_t(sd, prefix + ".weight"))}

    p: Params = {
        "shared_emb": {"table": jnp.asarray(_t(sd, "shared.weight"))},
        "enc_rel_bias": jnp.asarray(_t(
            sd, "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight")),
        "dec_rel_bias": jnp.asarray(_t(
            sd, "decoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight")),
        "enc_final_ln": rms("encoder.final_layer_norm"),
        "dec_final_ln": rms("decoder.final_layer_norm"),
    }
    enc = []
    for i in range(cfg.enc_layers):
        b = f"encoder.block.{i}"
        enc.append(
            {
                "attn": {
                    "q": lin(f"{b}.layer.0.SelfAttention.q"),
                    "k": lin(f"{b}.layer.0.SelfAttention.k"),
                    "v": lin(f"{b}.layer.0.SelfAttention.v"),
                    "o": lin(f"{b}.layer.0.SelfAttention.o"),
                },
                "attn_ln": rms(f"{b}.layer.0.layer_norm"),
                "ffn": {
                    "wi": lin(f"{b}.layer.1.DenseReluDense.wi"),
                    "wo": lin(f"{b}.layer.1.DenseReluDense.wo"),
                },
                "ffn_ln": rms(f"{b}.layer.1.layer_norm"),
            }
        )
    dec = []
    for i in range(cfg.dec_layers):
        b = f"decoder.block.{i}"
        dec.append(
            {
                "self_attn": {
                    "q": lin(f"{b}.layer.0.SelfAttention.q"),
                    "k": lin(f"{b}.layer.0.SelfAttention.k"),
                    "v": lin(f"{b}.layer.0.SelfAttention.v"),
                    "o": lin(f"{b}.layer.0.SelfAttention.o"),
                },
                "self_ln": rms(f"{b}.layer.0.layer_norm"),
                "cross_attn": {
                    "q": lin(f"{b}.layer.1.EncDecAttention.q"),
                    "k": lin(f"{b}.layer.1.EncDecAttention.k"),
                    "v": lin(f"{b}.layer.1.EncDecAttention.v"),
                    "o": lin(f"{b}.layer.1.EncDecAttention.o"),
                },
                "cross_ln": rms(f"{b}.layer.1.layer_norm"),
                "ffn": {
                    "wi": lin(f"{b}.layer.2.DenseReluDense.wi"),
                    "wo": lin(f"{b}.layer.2.DenseReluDense.wo"),
                },
                "ffn_ln": rms(f"{b}.layer.2.layer_norm"),
            }
        )
    p["encoder"] = enc
    p["decoder"] = dec
    return p
