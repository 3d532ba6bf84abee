"""Mesh-sharded exact (flat) MIPS index.

TPU-native replacement for the reference's FAISS `Flat` index path
(sotasum/mips.py:210-213 `string_factory="Flat"`, search at :382-400,
normalize-for-IP at :306-314, L2 metric via φ-augmentation at :316-331).

The corpus embedding matrix is HBM-resident, row-sharded across the
``shard`` mesh axis. A search is: broadcast the query block, run the fused
Pallas kernel per shard (global ids = local ids + shard offset), all-gather
the per-shard top-k over ICI (k is tiny, so this moves S·B·k·8 bytes), and
re-select the global top-k locally. This collapses the reference's
filesystem-based rank-0 merge protocol (mips.py:292-295) into one
compiled program.

Metric handling:
  * "ip"      — raw inner product; optional row L2-normalization
                (reference `mips_normalize`, mips.py:306-314),
  * "l2"      — smallest L2 distance, served by the same kernel via
                row_bias = −‖e‖²/2 (no φ-augmentation needed on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mips_topk import mips_topk, mips_topk_xla
from ..parallel.mesh import DATA_AXIS, SHARD_AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatIndex:
    """Immutable handle to a (possibly sharded) flat MIPS index.

    ``embeddings`` is [N_pad, D_pad]; padding rows carry row_bias = −inf so
    they can never be retrieved. Rebuilding the index (train-time refresh)
    just replaces this pytree — double-buffering is a pair of FlatIndex
    values and a pointer swap in the train loop.
    """

    embeddings: jax.Array  # [N_pad, D_pad] (bf16; int8 for SQ8 payloads)
    row_bias: jax.Array  # [N_pad] f32
    row_scale: jax.Array | None  # [N_pad] f32 dequant scales (SQ8 only)
    n: int = dataclasses.field(metadata=dict(static=True))
    metric: str = dataclasses.field(metadata=dict(static=True))
    normalized: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    @property
    def n_pad(self) -> int:
        return self.embeddings.shape[0]


def build_flat_index(
    embeddings,  # [N, D] host or device array
    *,
    metric: str = "ip",
    normalize: bool = False,
    dtype=jnp.bfloat16,
    mesh: Mesh | None = None,
    row_align: int = 2048,
) -> FlatIndex:
    """Construct the index (reference `build_index`, sotasum/mips.py:291-345).

    With a mesh, rows are sharded over the ``shard`` axis; N is padded to a
    multiple of shards × row_align so every shard is tile-aligned.
    """
    if metric not in ("ip", "l2"):
        raise ValueError(f"metric must be 'ip' or 'l2', got {metric!r}")
    sq8 = dtype in ("int8", jnp.int8)
    n, d = embeddings.shape
    shards = mesh.shape[SHARD_AXIS] if mesh is not None else 1
    n_pad = _round_up(n, shards * row_align)
    d_pad = _round_up(d, 256 if sq8 else 128)

    x = jnp.asarray(embeddings, dtype=jnp.float32)
    if normalize:
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
    if metric == "l2":
        bias = -0.5 * jnp.sum(x * x, axis=-1)
    else:
        bias = jnp.zeros((n,), jnp.float32)

    from ..ops.mips_topk import NEG_INF

    row_scale = None
    if sq8:
        from ..ops.mips_topk import quantize_corpus_sq8

        qvals, scales = quantize_corpus_sq8(x)
        emb = jnp.zeros((n_pad, d_pad), jnp.int8).at[:n, :d].set(qvals)
        row_scale = jnp.ones((n_pad,), jnp.float32).at[:n].set(scales)
    else:
        emb = jnp.zeros((n_pad, d_pad), dtype)
        emb = emb.at[:n, :d].set(x.astype(dtype))
    row_bias = jnp.full((n_pad,), NEG_INF, jnp.float32).at[:n].set(bias)

    if mesh is not None:
        emb = jax.device_put(emb, NamedSharding(mesh, P(SHARD_AXIS, None)))
        row_bias = jax.device_put(row_bias, NamedSharding(mesh, P(SHARD_AXIS)))
        if row_scale is not None:
            row_scale = jax.device_put(
                row_scale, NamedSharding(mesh, P(SHARD_AXIS))
            )

    return FlatIndex(
        embeddings=emb, row_bias=row_bias, row_scale=row_scale, n=n,
        metric=metric, normalized=normalize,
    )


def _merge_topk(vals_s, idx_s, k):
    """[S, B, k] per-shard candidates → global [B, k]."""
    s, b, _ = vals_s.shape
    vals_flat = jnp.transpose(vals_s, (1, 0, 2)).reshape(b, s * k)
    idx_flat = jnp.transpose(idx_s, (1, 0, 2)).reshape(b, s * k)
    top_vals, top_pos = jax.lax.top_k(vals_flat, k)
    top_idx = jnp.take_along_axis(idx_flat, top_pos, axis=-1)
    return top_vals, top_idx


def _local_search(q, emb, bias, scale, ign, *, k, backend):
    """Per-device search over the local shard; merges over the shard axis."""
    rows = emb.shape[0]
    try:
        shard_id = jax.lax.axis_index(SHARD_AXIS)
        n_shards = jax.lax.axis_size(SHARD_AXIS)
    except NameError:  # not under shard_map
        shard_id, n_shards = 0, 1
    offset = shard_id * rows

    local_ign = ign - offset  # out-of-range never matches local cols
    if backend == "pallas":
        vals, idx = mips_topk(q, emb, k, bias, local_ign, scale)
    else:
        e = emb if scale is None else emb.astype(jnp.float32) * scale[:, None]
        vals, idx = mips_topk_xla(q, e, k, bias, local_ign)
    idx = jnp.where(idx >= 0, idx + offset, -1)
    if n_shards == 1:
        return vals, idx
    vals_s = jax.lax.all_gather(vals, SHARD_AXIS)  # [S, B, k]
    idx_s = jax.lax.all_gather(idx, SHARD_AXIS)
    return _merge_topk(vals_s, idx_s, k)


def search(
    index: FlatIndex,
    queries: jax.Array,  # [B, D] (un-normalized; normalized here if needed)
    k: int = 10,
    ignore: jax.Array | None = None,  # [B, I] int32 global doc ids, -1 pad
    *,
    mesh: Mesh | None = None,
    data_sharded: bool = False,
    backend: str = "pallas",
):
    """Top-k search. Returns (scores f32 [B, k], doc ids int32 [B, k]).

    Scores are inner products ("ip") or −‖q−e‖²/2 + const ("l2" — rank
    order is exact, values are the biased dot).

    With a mesh, runs as a shard_map over the shard axis (and the data axis
    if ``data_sharded``), merging per-shard top-k via all_gather over ICI.
    """
    b, d = queries.shape
    d_pad = index.dim
    q = queries.astype(jnp.float32)
    if index.normalized and index.metric == "ip":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    if d != d_pad:
        q = jnp.zeros((b, d_pad), q.dtype).at[:, :d].set(q)
    if ignore is None:
        ign = jnp.full((b, 8), -1, jnp.int32)
    else:
        ign = ignore.astype(jnp.int32)

    fn = functools.partial(_local_search, k=k, backend=backend)
    if mesh is None or mesh.shape[SHARD_AXIS] == 1:
        if mesh is not None and data_sharded:
            q = jax.lax.with_sharding_constraint(
                q, NamedSharding(mesh, P(DATA_AXIS, None))
            )
        return fn(q, index.embeddings, index.row_bias, index.row_scale, ign)

    q_spec = P(DATA_AXIS, None) if data_sharded else P(None, None)
    out_b = P(DATA_AXIS, None) if data_sharded else P(None, None)
    scale_spec = None if index.row_scale is None else P(SHARD_AXIS)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(q_spec, P(SHARD_AXIS, None), P(SHARD_AXIS), scale_spec,
                  q_spec),
        out_specs=(out_b, out_b),
        check_vma=False,
    )(q, index.embeddings, index.row_bias, index.row_scale, ign)


# ---------------------------------------------------------------------------
# Persistence (reference Mips.save/load, sotasum/mips.py:531-549: FAISS
# index file + Arrow embeddings + pickled max-norm → here: npz shards +
# json metadata).
# ---------------------------------------------------------------------------

def save_flat_index(index: FlatIndex, path: str) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    if index.embeddings.dtype == jnp.int8:
        np.save(os.path.join(path, "embeddings.npy"),
                np.asarray(index.embeddings))
    else:
        np.save(os.path.join(path, "embeddings.npy"),
                np.asarray(index.embeddings.astype(jnp.float32)))
    np.save(os.path.join(path, "row_bias.npy"), np.asarray(index.row_bias))
    if index.row_scale is not None:
        np.save(os.path.join(path, "row_scale.npy"),
                np.asarray(index.row_scale))
    meta: dict[str, Any] = {
        "n": index.n,
        "metric": index.metric,
        "normalized": index.normalized,
        "dtype": str(index.embeddings.dtype),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_flat_index(path: str, *, mesh: Mesh | None = None) -> FlatIndex:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    emb = np.load(os.path.join(path, "embeddings.npy"))
    bias = np.load(os.path.join(path, "row_bias.npy"))
    if "int8" in meta["dtype"]:
        dtype = jnp.int8
    elif "bfloat16" in meta["dtype"]:
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32
    embj = jnp.asarray(emb, dtype)
    biasj = jnp.asarray(bias)
    scale_path = os.path.join(path, "row_scale.npy")
    scalej = jnp.asarray(np.load(scale_path)) if os.path.exists(scale_path) else None
    if mesh is not None:
        embj = jax.device_put(embj, NamedSharding(mesh, P(SHARD_AXIS, None)))
        biasj = jax.device_put(biasj, NamedSharding(mesh, P(SHARD_AXIS)))
        if scalej is not None:
            scalej = jax.device_put(scalej, NamedSharding(mesh, P(SHARD_AXIS)))
    return FlatIndex(
        embeddings=embj, row_bias=biasj, row_scale=scalej, n=meta["n"],
        metric=meta["metric"], normalized=meta["normalized"],
    )
