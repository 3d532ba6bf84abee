"""IVF-style clustered MIPS index: on-device k-means + probed search.

TPU-native analog of the reference's FAISS IVF factories
(`IVF256,SQ8` at sotasum/config.yaml:94, `IVF16,Flat` at sotasum/mips.py:727,
`nprobe` at sotasum/mips.py:342-345). FAISS trains a coarse quantizer on
CPU; here Lloyd iterations are batched matmuls on the MXU and the clustered
corpus lives in HBM as a fixed-shape [C, L, D] tensor (clusters padded to a
uniform length, overflow rows kept in an always-probed spill buffer so no
document is ever dropped — recall can only exceed FAISS at equal nprobe).

Search semantics ("batched union probe"): the batch's per-query top-nprobe
cluster ids are unioned (static cap B·nprobe), the union's clusters are
gathered once, and the fused flat kernel searches the gathered subset plus
the spill buffer. Per-query work is therefore shared across the batch —
the right trade on an MXU, where the corpus stream is amortized over all
queries in flight. A dedicated per-query DMA kernel for tiny serving
batches is future work (see ops/mips_topk.py for the flat kernel).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mips_topk import NEG_INF, mips_topk
from .flat import _round_up


# ---------------------------------------------------------------------------
# k-means (Lloyd) — matmul assignments, chunked one-hot updates.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "chunk"))
def kmeans(
    x: jax.Array,  # [N, D] f32
    key: jax.Array,
    n_clusters: int,
    iters: int = 15,
    chunk: int = 8192,
):
    """L2 k-means. Returns (centroids [C, D] f32, assignments [N] int32).

    Assignment minimizes ‖x−c‖² ⇔ maximizes x·c − ‖c‖²/2 (one matmul +
    row bias — same algebra the search kernel uses).
    """
    n, d = x.shape
    c0 = jax.random.choice(key, x, shape=(n_clusters,), replace=False)

    n_pad = _round_up(n, chunk)
    xp = jnp.zeros((n_pad, d), x.dtype).at[:n].set(x)
    valid = (jnp.arange(n_pad) < n).astype(x.dtype)

    def assign(cent, xc):
        bias = -0.5 * jnp.sum(cent * cent, axis=-1)
        scores = xc @ cent.T + bias[None, :]
        return jnp.argmax(scores, axis=-1)

    def step(cent, _):
        def body(carry, xc_and_v):
            sums, counts = carry
            xc, v = xc_and_v
            a = assign(cent, xc)
            onehot = jax.nn.one_hot(a, n_clusters, dtype=x.dtype) * v[:, None]
            sums = sums + onehot.T @ xc
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        xs = xp.reshape(-1, chunk, d)
        vs = valid.reshape(-1, chunk)
        (sums, counts), _ = jax.lax.scan(
            body, (jnp.zeros_like(cent), jnp.zeros((n_clusters,), x.dtype)),
            (xs, vs),
        )
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cent
        )
        return new, None

    cent, _ = jax.lax.scan(step, c0, None, length=iters)
    return cent, assign(cent, x).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Index construction
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IVFIndex:
    centroids: jax.Array  # [C, D_pad] f32
    centroid_bias: jax.Array  # [C] f32 (metric bias for probing)
    clustered: jax.Array  # [C, L, D_pad] corpus rows grouped by cluster
    clustered_ids: jax.Array  # [C, L] int32 global doc ids (-1 pad)
    clustered_bias: jax.Array  # [C, L] f32 (metric row bias; −inf on pads)
    spill: jax.Array  # [S, D_pad] overflow rows (always searched)
    spill_ids: jax.Array  # [S] int32
    spill_bias: jax.Array  # [S] f32
    n: int = dataclasses.field(metadata=dict(static=True))
    metric: str = dataclasses.field(metadata=dict(static=True))
    normalized: bool = dataclasses.field(metadata=dict(static=True))
    clustered_scale: jax.Array | None = None  # [C, L] f32 (SQ8 payloads)
    spill_scale: jax.Array | None = None  # [S] f32

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def build_ivf_index(
    embeddings,  # [N, D]
    n_clusters: int,
    *,
    metric: str = "ip",
    normalize: bool = False,
    dtype=jnp.bfloat16,
    alpha: float = 2.0,  # cluster capacity = alpha * N / C (tile-rounded)
    train_size: int | None = None,  # reference mips_train_size (config :53)
    iters: int = 15,
    seed: int = 0,
) -> IVFIndex:
    x = jnp.asarray(embeddings, jnp.float32)
    n, d = x.shape
    if normalize:
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    key = jax.random.PRNGKey(seed)
    train = x
    if train_size is not None and train_size < n:
        train = jax.random.choice(key, x, shape=(train_size,), replace=False)
    cent, _ = kmeans(train, key, n_clusters, iters=iters)
    # assign the full corpus against final centroids
    cbias = -0.5 * jnp.sum(cent * cent, axis=-1)
    assign = jnp.argmax(x @ cent.T + cbias[None, :], axis=-1).astype(jnp.int32)

    cap = max(8, _round_up(int(alpha * n / n_clusters), 8))

    # Host-side packing (one-time build step; the packed layout is what
    # lives on device). Mirrors FAISS's invlist construction.
    a = np.asarray(assign)
    xh = np.asarray(x)
    d_pad = _round_up(d, 128)
    clustered = np.zeros((n_clusters, cap, d_pad), np.float32)
    cids = np.full((n_clusters, cap), -1, np.int32)
    order = np.argsort(a, kind="stable")
    sorted_a = a[order]
    # position of each row within its cluster (vectorized cumcount)
    starts = np.searchsorted(sorted_a, np.arange(n_clusters))
    pos = np.arange(n) - starts[sorted_a]
    in_cap = pos < cap
    keep, kpos = order[in_cap], pos[in_cap]
    clustered[sorted_a[in_cap], kpos, :d] = xh[keep]
    cids[sorted_a[in_cap], kpos] = keep.astype(np.int32)
    over = order[~in_cap]

    s = max(8, _round_up(max(1, len(over)), 8))
    spill = np.zeros((s, d_pad), np.float32)
    sids = np.full((s,), -1, np.int32)
    if len(over):
        spill[: len(over), :d] = xh[over]
        sids[: len(over)] = over.astype(np.int32)

    if metric == "l2":
        row_b = lambda rows, valid: np.where(  # noqa: E731
            valid, -0.5 * (rows**2).sum(-1), NEG_INF
        ).astype(np.float32)
    else:
        row_b = lambda rows, valid: np.where(valid, 0.0, NEG_INF).astype(  # noqa: E731
            np.float32
        )

    cl_bias = row_b(clustered, cids >= 0)
    sp_bias = row_b(spill, sids >= 0)

    cent_pad = jnp.zeros((n_clusters, d_pad), jnp.float32).at[:, :d].set(cent)
    if metric == "l2":
        cent_bias = -0.5 * jnp.sum(cent_pad * cent_pad, axis=-1)
    else:
        cent_bias = jnp.zeros((n_clusters,), jnp.float32)

    cl_scale = sp_scale = None
    if dtype in ("int8", jnp.int8):
        # SQ8 payload (reference "IVF256,SQ8", sotasum/config.yaml:94):
        # per-row symmetric int8 quantization; scores scale per row.
        amax_c = np.maximum(np.abs(clustered).max(-1), 1e-12)
        sc_c = (amax_c / 127.0).astype(np.float32)
        clustered = np.clip(
            np.round(clustered / sc_c[..., None]), -127, 127
        ).astype(np.int8)
        amax_s = np.maximum(np.abs(spill).max(-1), 1e-12)
        sc_s = (amax_s / 127.0).astype(np.float32)
        spill = np.clip(np.round(spill / sc_s[:, None]), -127, 127).astype(
            np.int8
        )
        cl_scale = jnp.asarray(np.where(cids >= 0, sc_c, 1.0))
        sp_scale = jnp.asarray(np.where(sids >= 0, sc_s, 1.0))
        clustered_j = jnp.asarray(clustered)
        spill_j = jnp.asarray(spill)
    else:
        clustered_j = jnp.asarray(clustered, dtype)
        spill_j = jnp.asarray(spill, dtype)

    return IVFIndex(
        centroids=cent_pad,
        centroid_bias=cent_bias,
        clustered=clustered_j,
        clustered_ids=jnp.asarray(cids),
        clustered_bias=jnp.asarray(cl_bias),
        spill=spill_j,
        spill_ids=jnp.asarray(sids),
        spill_bias=jnp.asarray(sp_bias),
        clustered_scale=cl_scale,
        spill_scale=sp_scale,
        n=n,
        metric=metric,
        normalized=normalize,
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------

def _union_pad(flat_ids: jax.Array, cap: int, sentinel: int) -> jax.Array:
    """Unique ids of a flat int array, padded with ``sentinel`` to ``cap``."""
    srt = jnp.sort(flat_ids)
    first = jnp.concatenate([jnp.ones((1,), bool), srt[1:] != srt[:-1]])
    keyed = jnp.where(first, srt, sentinel)
    return jnp.sort(keyed)[:cap]


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(
    index: IVFIndex,
    queries: jax.Array,  # [B, D]
    k: int = 10,
    nprobe: int = 8,
    ignore: jax.Array | None = None,
):
    """Probed search. Returns (scores [B, k] f32, doc ids [B, k] int32)."""
    b, d = queries.shape
    d_pad = index.dim
    q = queries.astype(jnp.float32)
    if index.normalized and index.metric == "ip":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    if d != d_pad:
        q = jnp.zeros((b, d_pad), q.dtype).at[:, :d].set(q)

    c = index.n_clusters
    nprobe = min(nprobe, c)
    # coarse probe: top-nprobe centroids per query
    cscores = q @ index.centroids.T + index.centroid_bias[None, :]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, nprobe]

    cap = min(c, b * nprobe)
    union = _union_pad(probe.reshape(-1), cap, sentinel=c)  # [cap]
    in_union = union < c
    safe = jnp.where(in_union, union, 0)

    sub = jnp.take(index.clustered, safe, axis=0)  # [cap, L, D]
    sub_ids = jnp.take(index.clustered_ids, safe, axis=0)  # [cap, L]
    sub_bias = jnp.take(index.clustered_bias, safe, axis=0)
    sub_bias = jnp.where(in_union[:, None], sub_bias, NEG_INF)

    L = sub.shape[1]
    corpus = jnp.concatenate(
        [sub.reshape(cap * L, d_pad), index.spill.astype(sub.dtype)], axis=0
    )
    bias = jnp.concatenate([sub_bias.reshape(-1), index.spill_bias])
    ids = jnp.concatenate([sub_ids.reshape(-1), index.spill_ids])
    scale = None
    if index.clustered_scale is not None:
        sub_scale = jnp.take(index.clustered_scale, safe, axis=0)
        scale = jnp.concatenate([sub_scale.reshape(-1), index.spill_scale])

    ign = None
    if ignore is not None:
        # remap global ignore ids into subset positions: compare against ids
        # is dynamic; instead mask after retrieval is wrong — so mask by
        # matching retrieved ids below with k + I extra candidates.
        extra = ignore.shape[1]
        vals, pos = mips_topk(q, corpus, k + extra, bias, None, scale)
        got = jnp.take(ids, jnp.maximum(pos, 0))
        bad = (got[:, :, None] == ignore[:, None, :].astype(jnp.int32)).any(-1)
        vals = jnp.where(bad, NEG_INF, vals)
        vals, order = jax.lax.top_k(vals, k)
        got = jnp.take_along_axis(got, order, axis=-1)
        return vals, got
    vals, pos = mips_topk(q, corpus, k, bias, ign, scale)
    got = jnp.take(ids, jnp.maximum(pos, 0))
    got = jnp.where(pos >= 0, got, -1)
    return vals, got


# ---------------------------------------------------------------------------
# Persistence (reference Mips.save/load, sotasum/mips.py:531-549)
# ---------------------------------------------------------------------------

_IVF_ARRAYS = (
    "centroids", "centroid_bias", "clustered", "clustered_ids",
    "clustered_bias", "spill", "spill_ids", "spill_bias",
)


def save_ivf_index(index: IVFIndex, path: str) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    arrays = {name: np.asarray(getattr(index, name)) for name in _IVF_ARRAYS}
    if index.clustered_scale is not None:
        arrays["clustered_scale"] = np.asarray(index.clustered_scale)
        arrays["spill_scale"] = np.asarray(index.spill_scale)
    np.savez(os.path.join(path, "ivf.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "kind": "ivf",
                "n": index.n,
                "metric": index.metric,
                "normalized": index.normalized,
                "payload_dtype": str(index.clustered.dtype),
            },
            f,
        )


def load_ivf_index(path: str) -> IVFIndex:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "ivf.npz"))
    if "int8" in meta["payload_dtype"]:
        payload = jnp.int8
    elif "bfloat16" in meta["payload_dtype"]:
        payload = jnp.bfloat16
    else:
        payload = jnp.float32
    kw = {name: jnp.asarray(data[name]) for name in _IVF_ARRAYS}
    kw["clustered"] = kw["clustered"].astype(payload)
    kw["spill"] = kw["spill"].astype(payload)
    if "clustered_scale" in data:
        kw["clustered_scale"] = jnp.asarray(data["clustered_scale"])
        kw["spill_scale"] = jnp.asarray(data["spill_scale"])
    return IVFIndex(
        n=meta["n"], metric=meta["metric"], normalized=meta["normalized"],
        **kw,
    )
