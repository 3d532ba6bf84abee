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


def bert_params_from_hf(
    sd: Mapping[str, Any],
    cfg: EncoderConfig,
    prefix: str = "bert",
    adapter_name: str | None = None,
) -> dict:
    """BERT-family state_dict (SPECTER2 base is a BERT encoder) → our
    longformer pytree. Global projections are seeded from the local ones —
    the same "longformerization" HF applies when converting RoBERTa
    checkpoints, so with every token local the forward is BERT-equivalent
    up to the sliding-window truncation.

    ``adapter_name``: import a bottleneck adapter saved by the `adapters`
    library (key layout ``<layer>.output.adapters.<name>.adapter_down.0``),
    matching the SPECTER2 adapter attach at sotasum/mips.py:108-113.
    """
    pre = f"{prefix}." if prefix else ""
    e = f"{pre}embeddings"
    p: dict = {
        "tok_emb": _emb(sd, f"{e}.word_embeddings.weight"),
        "pos_emb": _emb(sd, f"{e}.position_embeddings.weight"),
        "emb_ln": _ln(sd, f"{e}.LayerNorm"),
    }
    tt = f"{e}.token_type_embeddings.weight"
    if tt in sd:
        p["type_emb"] = {"table": jnp.asarray(_t(sd, tt)[:1])}
    layers = []
    for i in range(cfg.n_layers):
        b = f"{pre}encoder.layer.{i}"
        a = f"{b}.attention.self"
        q, k, v = (_dense(sd, f"{a}.{n}") for n in ("query", "key", "value"))
        layer = {
            "attn": {
                "q": q, "k": k, "v": v,
                "qg": dict(q), "kg": dict(k), "vg": dict(v),
                "o": _dense(sd, f"{b}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{b}.attention.output.LayerNorm"),
            "ffn": {
                "w1": _dense(sd, f"{b}.intermediate.dense"),
                "w2": _dense(sd, f"{b}.output.dense"),
            },
            "ffn_ln": _ln(sd, f"{b}.output.LayerNorm"),
        }
        if adapter_name is not None:
            ad = f"{b}.output.adapters.{adapter_name}"
            layer["adapter"] = {
                "down": _dense(sd, f"{ad}.adapter_down.0"),
                "up": _dense(sd, f"{ad}.adapter_up"),
            }
        layers.append(layer)
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


def load_encoder_from_pretrained(
    name_or_path: str, cfg: EncoderConfig, adapter_name: str | None = None
) -> dict:
    """Load any encoder the reference uses into our longformer pytree:
    Longformer checkpoints map directly; BERT-family (SPECTER2 base,
    sotasum/mips.py:108-113) map via `bert_params_from_hf`."""
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(name_or_path)
    if getattr(hf_cfg, "model_type", "") == "longformer":
        from transformers import LongformerModel

        model = LongformerModel.from_pretrained(name_or_path)
        return longformer_params_from_hf(model.state_dict(), cfg, prefix="")
    model = AutoModel.from_pretrained(name_or_path)
    return bert_params_from_hf(
        model.state_dict(), cfg, prefix="", adapter_name=adapter_name
    )


def load_pretrained_rag(params: dict, cfg) -> dict:
    """Fill an init_rag param tree with pretrained weights named by config
    (the reference always starts from pretrained stacks: LED at
    sotasum/retriever_generator.py:250-253, SPECTER2 query/index encoders
    at retriever_generator.py:88-93 / mips.py:108-113, memory Longformer
    at mips.py:192-205; plus mips_state_dict/query_state_dict injection,
    model_config.py:29,62).

    Policy: a field naming an existing LOCAL path must load — failures
    raise. A hub name that cannot be fetched (zero-egress container, no
    cache) warns LOUDLY and keeps the random init for that group.
    """
    import os
    import warnings

    out = dict(params)

    def _load(field: str, group: str, fn):
        name = getattr(cfg, field)
        if not name:
            return
        try:
            out[group] = fn(name)
            print(f"[weights] {group} <- {name}")
        except Exception as e:  # noqa: BLE001
            if os.path.exists(name):
                raise RuntimeError(
                    f"failed to load {field}={name!r} into {group}: {e}"
                ) from e
            warnings.warn(
                f"[weights] SKIPPING {field}={name!r} ({group} stays "
                f"randomly initialized): {type(e).__name__}: {e}",
                stacklevel=2,
            )

    _load("led_weights", "led",
          lambda n: load_led_from_pretrained(n, cfg.led))
    _load("query_encoder_weights", "query_encoder",
          lambda n: load_encoder_from_pretrained(
              n, cfg.query_enc, adapter_name=cfg.adapter_name))
    _load("mips_encoder_weights", "mips_encoder",
          lambda n: load_encoder_from_pretrained(
              n, cfg.mips_enc, adapter_name=cfg.adapter_name))
    _load("memory_encoder_weights", "memory_encoder",
          lambda n: load_encoder_from_pretrained(n, cfg.memory_enc))

    if cfg.encoder_state_path:
        # retriever-pretrain handoff (reference mips_state_dict /
        # query_state_dict, loads at mips.py:115-117,
        # retriever_generator.py:95-97)
        if not os.path.exists(cfg.encoder_state_path):
            raise FileNotFoundError(
                f"model.encoder_state_path={cfg.encoder_state_path!r} "
                "does not exist (expected encoders.npz exported by "
                "`pretrain-retriever`)"
            )
        from ..utils.checkpoint import import_encoders

        out = import_encoders(cfg.encoder_state_path, out)
        print(f"[weights] query/mips encoders <- {cfg.encoder_state_path}")
    return out
