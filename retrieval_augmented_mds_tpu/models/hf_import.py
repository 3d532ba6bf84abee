"""HF weight import: torch state_dicts → framework param pytrees.

The reference downloads pretrained torch weights (LED, Longformer,
SPECTER2; SURVEY.md §2.4). The TPU framework keeps its own architecture
but imports those checkpoints for parity: these mappers translate HF
state_dicts (LEDForConditionalGeneration, LongformerModel — the SPECTER2
query/index encoders are BERT-family and load through the Longformer
mapper's naming with `attention.self.*`) into our pytrees. torch stays a
host-side, import-time dependency only.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .config import EncoderConfig, Seq2SeqConfig


def _t(sd: Mapping[str, Any], key: str) -> np.ndarray:
    w = sd[key]
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w, np.float32)


def _dense(sd, prefix: str) -> dict:
    return {
        "kernel": jnp.asarray(_t(sd, prefix + ".weight").T),
        "bias": jnp.asarray(_t(sd, prefix + ".bias")),
    }


def _ln(sd, prefix: str) -> dict:
    return {
        "scale": jnp.asarray(_t(sd, prefix + ".weight")),
        "bias": jnp.asarray(_t(sd, prefix + ".bias")),
    }


def _emb(sd, key: str) -> dict:
    return {"table": jnp.asarray(_t(sd, key))}


def led_params_from_hf(sd: Mapping[str, Any], cfg: Seq2SeqConfig) -> dict:
    """LEDForConditionalGeneration state_dict → init_led-compatible pytree.

    Reference wraps this model at sotasum/retriever_generator.py:250-253.
    """
    p: dict = {
        "shared_emb": _emb(sd, "led.shared.weight"),
        "enc_pos": _emb(sd, "led.encoder.embed_positions.weight"),
        "dec_pos": _emb(sd, "led.decoder.embed_positions.weight"),
        "enc_emb_ln": _ln(sd, "led.encoder.layernorm_embedding"),
        "dec_emb_ln": _ln(sd, "led.decoder.layernorm_embedding"),
        "final_logits_bias": jnp.asarray(
            _t(sd, "final_logits_bias").reshape(-1)
        ),
    }
    enc = []
    for i in range(cfg.enc_layers):
        b = f"led.encoder.layers.{i}"
        a = f"{b}.self_attn.longformer_self_attn"
        enc.append(
            {
                "attn": {
                    "q": _dense(sd, f"{a}.query"),
                    "k": _dense(sd, f"{a}.key"),
                    "v": _dense(sd, f"{a}.value"),
                    "qg": _dense(sd, f"{a}.query_global"),
                    "kg": _dense(sd, f"{a}.key_global"),
                    "vg": _dense(sd, f"{a}.value_global"),
                    "o": _dense(sd, f"{b}.self_attn.output"),
                },
                "attn_ln": _ln(sd, f"{b}.self_attn_layer_norm"),
                "ffn": {
                    "w1": _dense(sd, f"{b}.fc1"),
                    "w2": _dense(sd, f"{b}.fc2"),
                },
                "ffn_ln": _ln(sd, f"{b}.final_layer_norm"),
            }
        )
    dec = []
    for i in range(cfg.dec_layers):
        b = f"led.decoder.layers.{i}"
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
                "ffn": {
                    "w1": _dense(sd, f"{b}.fc1"),
                    "w2": _dense(sd, f"{b}.fc2"),
                },
                "ffn_ln": _ln(sd, f"{b}.final_layer_norm"),
            }
        )
    p["encoder"] = enc
    p["decoder"] = dec
    return p


def longformer_params_from_hf(
    sd: Mapping[str, Any], cfg: EncoderConfig, prefix: str = "longformer"
) -> dict:
    """LongformerModel state_dict → init_longformer-compatible pytree.

    Used for the memory encoder (sotasum/mips.py:192-205) and retriever
    dual encoders (sotasum/retriever_lightning.py:102-140).
    """
    pre = f"{prefix}." if prefix else ""
    e = f"{pre}embeddings"
    p: dict = {
        "tok_emb": _emb(sd, f"{e}.word_embeddings.weight"),
        "pos_emb": _emb(sd, f"{e}.position_embeddings.weight"),
        "emb_ln": _ln(sd, f"{e}.LayerNorm"),
    }
    # token_type row 0 is an additive constant on every position
    tt = f"{e}.token_type_embeddings.weight"
    if tt in sd:
        p["type_emb"] = {"table": jnp.asarray(_t(sd, tt)[:1])}
    layers = []
    for i in range(cfg.n_layers):
        b = f"{pre}encoder.layer.{i}"
        a = f"{b}.attention.self"
        layers.append(
            {
                "attn": {
                    "q": _dense(sd, f"{a}.query"),
                    "k": _dense(sd, f"{a}.key"),
                    "v": _dense(sd, f"{a}.value"),
                    "qg": _dense(sd, f"{a}.query_global"),
                    "kg": _dense(sd, f"{a}.key_global"),
                    "vg": _dense(sd, f"{a}.value_global"),
                    "o": _dense(sd, f"{b}.attention.output.dense"),
                },
                "attn_ln": _ln(sd, f"{b}.attention.output.LayerNorm"),
                "ffn": {
                    "w1": _dense(sd, f"{b}.intermediate.dense"),
                    "w2": _dense(sd, f"{b}.output.dense"),
                },
                "ffn_ln": _ln(sd, f"{b}.output.LayerNorm"),
            }
        )
    p["layers"] = layers
    return p


def load_led_from_pretrained(name_or_path: str, cfg: Seq2SeqConfig) -> dict:
    from transformers import LEDForConditionalGeneration

    model = LEDForConditionalGeneration.from_pretrained(name_or_path)
    return led_params_from_hf(model.state_dict(), cfg)


def load_longformer_from_pretrained(name_or_path: str, cfg: EncoderConfig) -> dict:
    from transformers import LongformerModel

    model = LongformerModel.from_pretrained(name_or_path)
    return longformer_params_from_hf(model.state_dict(), cfg)
