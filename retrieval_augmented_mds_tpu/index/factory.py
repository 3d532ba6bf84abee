"""FAISS-style string-factory front door.

The reference selects its index by FAISS factory string
(`mips_string_factory`, sotasum/model_config.py:50; values seen in-tree:
"Flat", "IVF256,SQ8", "IVF16,Flat", "IVF{2048,16384_HNSW32,...},Flat" at
config/no_mips.yaml:108-112). This parser maps those strings onto the TPU
engines so existing configs keep working:

  * "Flat"          → FlatIndex (exact fused-kernel search)
  * "IVF<n>,Flat"   → IVFIndex with n clusters
  * "IVF<n>,SQ8"    → IVFIndex with n clusters and int8 scalar-quantized
                      payloads (per-row scales, quantized before the
                      invlist scatter; ivf.py:_pack_device)
  * "IVF<n>_HNSW32,Flat" → IVFIndex with n clusters (the HNSW coarse
                      quantizer accelerates CPU centroid lookup; on the MXU
                      the exact centroid scan is a single small matmul, so
                      the graph layer is unnecessary)
"""

from __future__ import annotations

import re
from typing import Any

import jax.numpy as jnp

from .flat import FlatIndex, build_flat_index
from .ivf import IVFIndex, build_ivf_index

_IVF_RE = re.compile(r"^IVF(\d+)(?:_HNSW\d+)?$")


def parse_factory(spec: str) -> dict[str, Any]:
    parts = [p.strip() for p in spec.split(",")]
    if parts == ["Flat"]:
        return {"kind": "flat"}
    if len(parts) == 2:
        m = _IVF_RE.match(parts[0])
        if m and parts[1] in ("Flat", "SQ8"):
            return {"kind": "ivf", "n_clusters": int(m.group(1)),
                    "payload": parts[1].lower()}
    raise ValueError(f"unsupported index factory: {spec!r}")


def build_index_from_factory(
    embeddings,
    spec: str,
    *,
    metric: str = "ip",
    normalize: bool = False,
    dtype=jnp.bfloat16,
    mesh=None,
    train_size: int | None = None,
    seed: int = 0,
) -> FlatIndex | IVFIndex:
    """Build an index from a FAISS factory string (reference
    `add_faiss_index(string_factory=...)`, sotasum/mips.py:333-340)."""
    p = parse_factory(spec)
    if p["kind"] == "flat":
        return build_flat_index(
            embeddings, metric=metric, normalize=normalize, dtype=dtype,
            mesh=mesh,
        )
    n_clusters = min(p["n_clusters"], max(1, len(embeddings) // 8))
    n_shards = 1
    if mesh is not None:
        from ..parallel.mesh import SHARD_AXIS

        n_shards = mesh.shape.get(SHARD_AXIS, 1)
        if n_shards > 1:
            # cluster-partitioned placement needs C % shards == 0
            n_clusters = max(n_shards, (n_clusters // n_shards) * n_shards)
    if n_clusters != p["n_clusters"]:
        # the factory string's cluster count was adjusted (corpus too
        # small, or rounded to the shard count) — say so instead of
        # silently deviating from the config
        import sys

        print(
            f"[index] factory {spec!r}: effective n_clusters="
            f"{n_clusters} (requested {p['n_clusters']}; "
            f"corpus={len(embeddings)}, shards={n_shards})",
            file=sys.stderr,
        )
    payload_dtype = "int8" if p["payload"] == "sq8" else dtype
    index = build_ivf_index(
        embeddings, n_clusters, metric=metric, normalize=normalize,
        dtype=payload_dtype, train_size=train_size, seed=seed,
    )
    if n_shards > 1:
        from .ivf import shard_ivf_index

        index = shard_ivf_index(index, mesh)
    return index
