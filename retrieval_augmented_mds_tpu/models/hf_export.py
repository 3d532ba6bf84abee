"""HF weight export: framework param pytrees → torch `save_pretrained`.

Inverse of hf_import.py for the encoder family. The reference exports its
pretrained retrievers through `save_pretrained` so any HF/torch stack can
consume them (sotasum/pretrain.py:671-681); this module closes the same
interop loop for encoders trained here: a longformer-pytree becomes a
standard `LongformerModel` directory loadable with `from_pretrained`.

torch/transformers are host-side, export-time dependencies only — nothing
here touches the TPU compute path.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from .config import EncoderConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _dense_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    # our kernel is [in, out]; torch Linear.weight is [out, in]
    sd[prefix + ".weight"] = _np(p["kernel"]).T
    sd[prefix + ".bias"] = _np(p["bias"])


def _ln_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])


def longformer_state_dict_arrays(
    params: Mapping[str, Any], cfg: EncoderConfig, type_vocab_size: int = 1
) -> dict[str, np.ndarray]:
    """Longformer pytree → HF `LongformerModel` state_dict (numpy values,
    bare-model naming — no "longformer." prefix). Exact inverse of
    `hf_import.longformer_params_from_hf(prefix="")`."""
    sd: dict[str, np.ndarray] = {}
    e = "embeddings"
    sd[f"{e}.word_embeddings.weight"] = _np(params["tok_emb"]["table"])
    sd[f"{e}.position_embeddings.weight"] = _np(params["pos_emb"]["table"])
    _ln_out(sd, f"{e}.LayerNorm", params["emb_ln"])
    h = sd[f"{e}.word_embeddings.weight"].shape[1]
    tt = np.zeros((type_vocab_size, h), np.float32)
    if "type_emb" in params:
        # we keep only row 0 (an additive constant on every position —
        # see the import note); other rows export as zero
        tt[0] = _np(params["type_emb"]["table"])[0]
    sd[f"{e}.token_type_embeddings.weight"] = tt

    for i, layer in enumerate(params["layers"]):
        b = f"encoder.layer.{i}"
        a = f"{b}.attention.self"
        attn = layer["attn"]
        for ours, theirs in (
            ("q", "query"), ("k", "key"), ("v", "value"),
            ("qg", "query_global"), ("kg", "key_global"),
            ("vg", "value_global"),
        ):
            _dense_out(sd, f"{a}.{theirs}", attn[ours])
        _dense_out(sd, f"{b}.attention.output.dense", attn["o"])
        _ln_out(sd, f"{b}.attention.output.LayerNorm", layer["attn_ln"])
        _dense_out(sd, f"{b}.intermediate.dense", layer["ffn"]["w1"])
        _dense_out(sd, f"{b}.output.dense", layer["ffn"]["w2"])
        _ln_out(sd, f"{b}.output.LayerNorm", layer["ffn_ln"])
    return sd


def save_encoder_pretrained(
    params: Mapping[str, Any],
    cfg: EncoderConfig,
    out_dir: str,
) -> dict[str, Any]:
    """Write a `transformers`-loadable LongformerModel directory from a
    framework encoder pytree (the `save_pretrained` handoff of reference
    pretrain.py:671-681). Bottleneck adapter weights (SPECTER2-style,
    a first-class param group here) have no vanilla-Longformer slot; they
    are saved alongside as ``adapter.npz`` and reported in the manifest.

    Returns a manifest dict (also written as ``export_manifest.json``).
    """
    import torch
    from transformers import LongformerConfig, LongformerModel

    hf_cfg = LongformerConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.d_ffn,
        max_position_embeddings=cfg.max_len + cfg.pos_offset,
        attention_window=[2 * cfg.window] * cfg.n_layers,
        type_vocab_size=1,
        pad_token_id=cfg.pad_id,
        bos_token_id=cfg.bos_id,
        eos_token_id=cfg.eos_id,
    )
    model = LongformerModel(hf_cfg, add_pooling_layer=False)
    arrays = longformer_state_dict_arrays(params, cfg, type_vocab_size=1)
    # torch.tensor copies — jax-backed buffers are read-only views
    sd = {k: torch.tensor(v) for k, v in arrays.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # every exported tensor must land; the model may own extra buffers
    # (e.g. position_ids) that we legitimately don't ship
    if unexpected:
        raise ValueError(f"unmapped exported keys: {unexpected}")
    bad = [m for m in missing if "position_ids" not in m]
    if bad:
        raise ValueError(f"model weights not covered by export: {bad}")
    os.makedirs(out_dir, exist_ok=True)
    model.save_pretrained(out_dir)

    manifest: dict[str, Any] = {
        "format": "transformers:LongformerModel",
        "n_tensors": len(arrays),
        "adapter": False,
    }
    if any("adapter" in layer for layer in params["layers"]):
        np.savez(
            os.path.join(out_dir, "adapter.npz"),
            **{
                f"layers.{i}.{ud}.{wb}": _np(layer["adapter"][ud][wb])
                for i, layer in enumerate(params["layers"])
                if "adapter" in layer
                for ud in ("down", "up")
                for wb in ("kernel", "bias")
            },
        )
        manifest["adapter"] = True
    import json

    with open(os.path.join(out_dir, "export_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
