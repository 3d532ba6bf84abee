"""Checkpointing: train state, params, and encoder export/import.

Mirrors the reference's checkpoint surface (SURVEY.md §5.4): Lightning
ModelCheckpoint → `save_train_state`/`load_train_state`; retriever encoder
export via `save_pretrained` + raw state_dict re-injection
(sotasum/pretrain.py:671-681, ModelConfig.mips_state_dict/query_state_dict
loads at sotasum/mips.py:115-117, retriever_generator.py:95-97) →
`export_encoders`/`import_encoders` operating on param subtrees.

Format: npz of flattened pytree leaves + the key paths — dependency-free,
mesh-agnostic (arrays are fetched to host; reloading re-places them with
whatever shardings the fresh state uses).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


_BF16_MARKER = "__bf16_keys__"


def _flatten(tree) -> tuple[dict[str, np.ndarray], list[str]]:
    flat = {}
    bf16_keys = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(leaf)
        if arr.dtype == jax.numpy.bfloat16:
            # npz has no bf16: store the raw bits, and record which keys
            # hold them so load_pytree can bit-view (never value-convert)
            # regardless of the template leaf's dtype
            arr = arr.view(np.uint16)
            bf16_keys.append(key)
        flat[key] = arr
    return flat, bf16_keys


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, bf16_keys = _flatten(tree)
    assert _BF16_MARKER not in flat
    np.savez(path, **flat, **{_BF16_MARKER: np.array(bf16_keys)})


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (shapes must match; dtypes
    may differ — e.g. resuming an adam_mu_dtype=bfloat16 checkpoint into
    an all-f32 state — the stored value is converted, never bit-cast to
    the wrong interpretation)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    bf16_keys = (
        set(data[_BF16_MARKER].tolist()) if _BF16_MARKER in data else None
    )
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    flat_keys = list(_flatten(like)[0].keys())
    assert len(flat_keys) == len(leaves_like)
    leaves = []
    for key, leaf in zip(flat_keys, leaves_like):
        arr = data[key]
        assert arr.shape == tuple(leaf.shape), (key, arr.shape, leaf.shape)
        if bf16_keys is not None:
            if key in bf16_keys:
                arr = arr.view(jax.numpy.bfloat16)
        elif arr.dtype == np.uint16 and leaf.dtype == jax.numpy.bfloat16:
            # legacy checkpoint (no marker): can't tell bf16 bits from a
            # genuine uint16 leaf, so only bit-view when the template
            # says bf16 (the pre-marker behavior)
            arr = arr.view(jax.numpy.bfloat16)
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(ckpt_dir: str, state, step: int, keep: int = 1) -> str:
    """Write ``ckpt_dir/step_<N>.npz`` (+ meta); prune old checkpoints
    (reference save_top_k=1, no_mips.yaml:27-33). ``latest.json`` always
    points at the newest save (the crash-resume anchor for
    train.save_every periodic saves); a checkpoint marked via
    ``mark_best`` is never pruned, so the rouge1-monitored best survives
    later periodic saves."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}.npz")
    save_pytree(path, state)
    with open(os.path.join(ckpt_dir, "latest.json"), "w") as f:
        json.dump({"step": step, "path": path}, f)
    protected = set()
    best_meta = os.path.join(ckpt_dir, "best.json")
    if os.path.exists(best_meta):
        with open(best_meta) as f:
            protected.add(os.path.basename(json.load(f)["path"]))
    existing = sorted(
        (p for p in os.listdir(ckpt_dir)
         if p.startswith("step_") and p not in protected),
        key=lambda p: int(p.split("_")[1].split(".")[0]),
    )
    for old in existing[:-keep]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def mark_best(ckpt_dir: str, step: int, path: str, metric: float | None = None):
    """Record the best-metric checkpoint (the reference's
    monitor='rouge1' ModelCheckpoint selection); protects it from the
    keep-N prune of subsequent periodic saves."""
    with open(os.path.join(ckpt_dir, "best.json"), "w") as f:
        json.dump({"step": step, "path": path, "metric": metric}, f)


def load_train_state(ckpt_dir: str, like, prefer: str = "latest") -> tuple[Any, int]:
    """``prefer='latest'`` resumes training from the newest save;
    ``prefer='best'`` loads the rouge1-monitored best when one was
    marked (evaluation use), falling back to latest."""
    meta_name = "latest.json"
    if prefer == "best" and os.path.exists(os.path.join(ckpt_dir, "best.json")):
        meta_name = "best.json"
    with open(os.path.join(ckpt_dir, meta_name)) as f:
        meta = json.load(f)
    return load_pytree(meta["path"], like), meta["step"]


def export_encoders(path: str, params: dict, groups=("query_encoder", "mips_encoder")):
    """Export trained retriever encoders for later injection into the
    summarizer (the reference's save_pretrained round trip)."""
    save_pytree(path, {g: params[g] for g in groups})


def import_encoders(path: str, params: dict, groups=("query_encoder", "mips_encoder")):
    sub = {g: params[g] for g in groups}
    loaded = load_pytree(path, sub)
    out = dict(params)
    out.update(loaded)
    return out
