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
queries in flight. At serving shapes (B·nprobe < C on TPU) `ivf_search`
routes to the per-query double-buffered DMA kernel in ivf_serving.py
instead — each query reads exactly its own nprobe clusters from HBM.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mips_topk import NEG_INF, mips_topk
from .flat import FlatIndex, _round_up, build_flat_index
from .flat import search as flat_search


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
    # Optional flat sibling of the same payload (original row order): the
    # scan-all route (B·nprobe ≥ C — the training shape) delegates to the
    # fused flat kernel over it, skipping the clustered layout's α·N
    # padding overhead entirely. Kept only when the payload is small
    # enough that duplicating it is cheap (build_ivf_index keep_flat).
    flat: FlatIndex | None = None
    # exact overflow-row count from packing; 0 ⇒ spill scans are skipped
    # (-1 = unknown, e.g. indexes loaded from old saves)
    n_spill: int = dataclasses.field(
        default=-1, metadata=dict(static=True)
    )

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "cap", "spill_cap", "d_pad",
                              "metric", "sq8", "payload")
)
def _pack_device(x, assign, *, n_clusters, cap, spill_cap, d_pad, metric,
                 sq8, payload=jnp.bfloat16):
    """Device-side invlist packing: sort by cluster, cumcount positions,
    one row-window scatter into [C, cap, D] (+ spill). Replaces the old
    host loop — the packed layout never leaves HBM (the reference's
    filesystem data plane, gone; SURVEY.md §5.8).

    Rows are cast/quantized to the payload dtype and per-row metric
    biases (+ SQ8 scales) are computed from the f32 originals BEFORE the
    scatter, so the [C, cap, D] buffer is allocated directly at payload
    width — at N=1M, D=768 the old f32-then-quantize order peaked at
    ~6.4 GB for that buffer alone and OOMed a 16 GB chip."""
    n, d = x.shape
    if d_pad == d:
        xp = x.astype(jnp.float32)
    else:
        xp = jnp.zeros((n, d_pad), jnp.float32).at[:, :d].set(x)

    # per-row metric bias and SQ8 scale from full-precision rows
    if metric == "l2":
        row_bias = -0.5 * jnp.sum(xp * xp, axis=-1)  # [N]
    else:
        row_bias = jnp.zeros((n,), jnp.float32)
    if sq8:
        amax = jnp.maximum(jnp.max(jnp.abs(xp), axis=-1), 1e-12)
        row_scale = amax / 127.0  # [N]
        xq = jnp.clip(
            jnp.round(xp / row_scale[:, None]), -127, 127
        ).astype(jnp.int8)
    else:
        row_scale = None
        xq = xp.astype(payload)

    order = jnp.argsort(assign, stable=True)
    sorted_a = assign[order]
    starts = jnp.searchsorted(sorted_a, jnp.arange(n_clusters))
    pos = jnp.arange(n) - starts[sorted_a]
    in_cap = pos < cap
    xs = xq[order]
    bs = row_bias[order]

    # clustered rows: scatter kept rows at (cluster, pos)
    dest_c = jnp.where(in_cap, sorted_a, n_clusters)  # OOB drops
    dest_p = jnp.where(in_cap, pos, 0)
    clustered = jnp.zeros((n_clusters + 1, cap, d_pad), xs.dtype)
    clustered = clustered.at[dest_c, dest_p].set(xs, mode="drop")[:-1]
    cids = jnp.full((n_clusters + 1, cap), -1, jnp.int32)
    cids = cids.at[dest_c, dest_p].set(
        order.astype(jnp.int32), mode="drop"
    )[:-1]
    cl_bias = jnp.full((n_clusters + 1, cap), NEG_INF, jnp.float32)
    cl_bias = cl_bias.at[dest_c, dest_p].set(bs, mode="drop")[:-1]

    # spill rows: compact overflow via cumsum positions
    over_pos = jnp.cumsum(~in_cap) - 1
    dest_s = jnp.where(~in_cap & (over_pos < spill_cap), over_pos, spill_cap)
    spill = jnp.zeros((spill_cap + 1, d_pad), xs.dtype)
    spill = spill.at[dest_s].set(xs, mode="drop")[:-1]
    sids = jnp.full((spill_cap + 1,), -1, jnp.int32)
    sids = sids.at[dest_s].set(order.astype(jnp.int32), mode="drop")[:-1]
    sp_bias = jnp.full((spill_cap + 1,), NEG_INF, jnp.float32)
    sp_bias = sp_bias.at[dest_s].set(bs, mode="drop")[:-1]
    n_over = jnp.sum(~in_cap)

    cl_scale = sp_scale = None
    if sq8:
        ss = row_scale[order]
        cl_scale = jnp.ones((n_clusters + 1, cap), jnp.float32)
        cl_scale = cl_scale.at[dest_c, dest_p].set(ss, mode="drop")[:-1]
        sp_scale = jnp.ones((spill_cap + 1,), jnp.float32)
        sp_scale = sp_scale.at[dest_s].set(ss, mode="drop")[:-1]

    return clustered, cids, cl_bias, spill, sids, sp_bias, cl_scale, \
        sp_scale, n_over


def build_ivf_index(
    embeddings,  # [N, D]
    n_clusters: int,
    *,
    metric: str = "ip",
    normalize: bool = False,
    dtype=jnp.bfloat16,
    alpha: float = 1.5,  # cluster capacity = alpha * N / C (tile-rounded).
    # Padding is pure overhead for the always-scanned layouts (the
    # scan-all route and the serving kernel's per-probe DMA read α·N/C
    # rows per cluster); overflow rows land in the always-probed spill
    # buffer, so recall is unaffected. 1.5 balances padding bandwidth
    # against spill growth on k-means-balanced corpora.
    train_size: int | None = None,  # reference mips_train_size (config :53)
    iters: int = 15,
    seed: int = 0,
    spill_cap: int | None = None,  # static overflow capacity
    keep_flat: bool | None = None,  # also keep a flat payload copy; None =
    # auto (payload ≤ 384 MB). Training-shape searches (B·nprobe ≥ C)
    # then run at flat-kernel speed instead of scanning the padded
    # clustered layout (measured v5e @ N=131k, B=256: 1.52 → 0.67 ms).
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
    d_pad = _round_up(d, 128)
    if spill_cap is None:
        # exact overflow count (cheap bincount), bucketed to powers of two
        # so distinct corpora reuse the packing executable
        counts = jnp.bincount(assign, length=n_clusters)
        n_over = int(jnp.sum(jnp.maximum(counts - cap, 0)))
        spill_cap = 64
        while spill_cap < n_over:
            spill_cap *= 2
    sq8 = dtype in ("int8", jnp.int8)

    (clustered, cids, cl_bias, spill, sids, sp_bias, cl_scale, sp_scale,
     n_over_packed) = _pack_device(
        x, assign, n_clusters=n_clusters, cap=cap, spill_cap=spill_cap,
        d_pad=d_pad, metric=metric, sq8=sq8,
        payload=jnp.int8 if sq8 else dtype,
    )
    if int(n_over_packed) > spill_cap:
        raise ValueError(
            f"cluster overflow {int(n_over_packed)} exceeds spill capacity "
            f"{spill_cap}; raise alpha or spill_cap"
        )

    cent_pad = jnp.zeros((n_clusters, d_pad), jnp.float32).at[:, :d].set(cent)
    if metric == "l2":
        cent_bias = -0.5 * jnp.sum(cent_pad * cent_pad, axis=-1)
    else:
        cent_bias = jnp.zeros((n_clusters,), jnp.float32)

    if keep_flat is None:
        itemsize = 1 if sq8 else jnp.dtype(dtype).itemsize
        keep_flat = n * d_pad * itemsize <= 384 * 2**20
    flat = None
    if keep_flat:
        # x is already normalized above when requested; the sibling must
        # not re-normalize, but must normalize queries iff we did
        flat = dataclasses.replace(
            build_flat_index(x, metric=metric, normalize=False, dtype=dtype),
            normalized=normalize,
        )

    return IVFIndex(
        centroids=cent_pad,
        centroid_bias=cent_bias,
        clustered=clustered,
        clustered_ids=cids,
        clustered_bias=cl_bias,
        spill=spill,
        spill_ids=sids,
        spill_bias=sp_bias,
        clustered_scale=cl_scale,
        spill_scale=sp_scale,
        n=n,
        metric=metric,
        normalized=normalize,
        flat=flat,
        n_spill=int(n_over_packed),
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------

_SERVING_RUN = 128  # running top-k lanes of the serving kernel (= ops _RUN)


def _serving_kernel_on() -> bool:
    """Serving-shape searches route through the per-query DMA kernel
    (ivf_serving.py) on real TPUs; RAMDS_IVF_SERVING=1 forces the route
    (interpret mode — route-equivalence tests), RAMDS_FORCE_XLA_OPS=1
    forces the union-probe XLA composite."""
    import os

    if os.environ.get("RAMDS_FORCE_XLA_OPS", "") == "1":
        return False
    if os.environ.get("RAMDS_IVF_SERVING", "") == "1":
        return True
    return jax.default_backend() == "tpu"


def _union_pad(flat_ids: jax.Array, cap: int, sentinel: int) -> jax.Array:
    """Unique ids of a flat int array, padded with ``sentinel`` to ``cap``."""
    srt = jnp.sort(flat_ids)
    first = jnp.concatenate([jnp.ones((1,), bool), srt[1:] != srt[:-1]])
    keyed = jnp.where(first, srt, sentinel)
    return jnp.sort(keyed)[:cap]


def _scan_all_clusters(index: IVFIndex, q: jax.Array, k: int, ignore):
    """Exact search over the clustered layout, no gather: the [C, L, D]
    payload viewed as one [C*L, D] corpus (free reshape — row-major
    contiguous) plus the spill, each scanned by the fused flat kernel and
    merged by top-k. Used when the batch's probe union would cover every
    cluster anyway (B·nprobe ≥ C — the training shape): gathering the
    union reads the whole corpus AND writes a copy, so the direct scan is
    strictly faster and recall becomes exact (≥ any nprobe)."""
    c, L, d_pad = index.clustered.shape
    extra = ignore.shape[1] if ignore is not None else 0
    kk = k + extra

    corpus = index.clustered.reshape(c * L, d_pad)
    bias = index.clustered_bias.reshape(-1)
    ids = index.clustered_ids.reshape(-1)
    scale = (
        index.clustered_scale.reshape(-1)
        if index.clustered_scale is not None else None
    )
    v1, p1 = mips_topk(q, corpus, kk, bias, None, scale)
    g1 = jnp.where(p1 >= 0, jnp.take(ids, jnp.maximum(p1, 0)), -1)

    if index.n_spill == 0:
        # packing proved the spill buffer empty — skip its scan + merge
        vals, gids = v1, g1
    else:
        k2 = min(kk, index.spill.shape[0])
        v2, p2 = mips_topk(
            q, index.spill, k2, index.spill_bias, None, index.spill_scale
        )
        g2 = jnp.where(
            p2 >= 0, jnp.take(index.spill_ids, jnp.maximum(p2, 0)), -1
        )
        vals = jnp.concatenate([v1, v2], axis=-1)
        gids = jnp.concatenate([g1, g2], axis=-1)
    if ignore is not None:
        bad = (
            gids[:, :, None] == ignore[:, None, :].astype(jnp.int32)
        ).any(-1)
        vals = jnp.where(bad, NEG_INF, vals)
    vals, order = jax.lax.top_k(vals, k)
    got = jnp.take_along_axis(gids, order, axis=-1)
    got = jnp.where(vals > NEG_INF / 2, got, -1)
    return vals, got


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "serving"))
def ivf_search(
    index: IVFIndex,
    queries: jax.Array,  # [B, D]
    k: int = 10,
    nprobe: int = 8,
    ignore: jax.Array | None = None,
    *,
    serving: bool | None = None,
):
    """Probed search. Returns (scores [B, k] f32, doc ids [B, k] int32).

    ``serving`` pins the serving-shape route (per-query DMA kernel) on or
    off; None = decide from backend/env (`_serving_kernel_on`). Static —
    explicit values force distinct traces, so tests can compare routes."""
    b, d = queries.shape
    d_pad = index.dim
    c = index.n_clusters
    nprobe_eff = min(nprobe, c)
    if b * nprobe_eff >= c and index.flat is not None:
        # training-shape route over the flat sibling payload: exact, and
        # skips the clustered layout's α·N padding (1.52 → 0.67 ms @
        # N=131k, B=256 on v5e); ids are original row order, so results
        # are identical to a flat index over the same payload
        return flat_search(index.flat, queries, k=k, ignore=ignore)

    q = queries.astype(jnp.float32)
    if index.normalized and index.metric == "ip":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    if d != d_pad:
        q = jnp.zeros((b, d_pad), q.dtype).at[:, :d].set(q)

    nprobe = nprobe_eff
    if b * nprobe >= c:
        # training-shape route without a flat sibling (huge corpora):
        # direct scan of the clustered layout (5.19 → 1.52 ms vs
        # union-probe @ N=131k, B=256, IVF256; exact recall)
        return _scan_all_clusters(index, q, k, ignore)

    k_fetch = k + (0 if ignore is None else ignore.shape[1])
    use_serving = _serving_kernel_on() if serving is None else serving
    if use_serving and k_fetch <= _SERVING_RUN:
        # serving-shape route (B·nprobe < C, small batch): the per-query
        # DMA kernel reads exactly each query's nprobe clusters from HBM
        # (0.60 ms vs 1.6 ms flat @ N=1M, B=4, nprobe=32 on v5e-1) —
        # FAISS's per-query probe semantics, replacing the reference hot
        # loop at sotasum/mips.py:382-400. The union-probe gather below
        # stays as the XLA composite (RAMDS_FORCE_XLA_OPS=1); its
        # candidate set is a superset (the batch's probe union), so at
        # B=1 results are identical and at B>1 the composite's recall
        # can only exceed the per-query route's.
        from .ivf_serving import ivf_search_serving

        return ivf_search_serving(
            index, queries, k=k, nprobe=nprobe, ignore=ignore
        )

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
    if index.n_spill == 0:
        # spill proven empty at packing — search the union alone
        corpus = sub.reshape(cap * L, d_pad)
        bias = sub_bias.reshape(-1)
        ids = sub_ids.reshape(-1)
        scale = None
        if index.clustered_scale is not None:
            scale = jnp.take(
                index.clustered_scale, safe, axis=0
            ).reshape(-1)
    else:
        corpus = jnp.concatenate(
            [sub.reshape(cap * L, d_pad), index.spill.astype(sub.dtype)],
            axis=0,
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

    def _portable(x):
        # bf16 has no portable npz encoding (np.load hands back raw |V2
        # voids); store float payloads as f32 and restore the dtype from
        # meta on load — exact, bf16 ⊂ f32
        v = np.asarray(x)
        return v if v.dtype.kind in "iu" else v.astype(np.float32)

    arrays = {name: _portable(getattr(index, name)) for name in _IVF_ARRAYS}
    if index.clustered_scale is not None:
        arrays["clustered_scale"] = _portable(index.clustered_scale)
        arrays["spill_scale"] = _portable(index.spill_scale)
    np.savez(os.path.join(path, "ivf.npz"), **arrays)
    if index.flat is not None:
        from .flat import save_flat_index

        save_flat_index(index.flat, os.path.join(path, "flat"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "kind": "ivf",
                "n": index.n,
                "metric": index.metric,
                "normalized": index.normalized,
                "payload_dtype": str(index.clustered.dtype),
                "n_spill": index.n_spill,
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
    flat_dir = os.path.join(path, "flat")
    if os.path.isdir(flat_dir):
        from .flat import load_flat_index

        kw["flat"] = load_flat_index(flat_dir)
    return IVFIndex(
        n=meta["n"], metric=meta["metric"], normalized=meta["normalized"],
        n_spill=meta.get("n_spill", -1), **kw,
    )


# ---------------------------------------------------------------------------
# Mesh-sharded search (clusters partitioned over the shard axis)
# ---------------------------------------------------------------------------

def shard_ivf_index(index: IVFIndex, mesh) -> IVFIndex:
    """Place the clustered payload row-sharded over the ``shard`` axis
    (centroids stay replicated — the coarse scan is one small matmul).
    Cluster count must divide the shard count."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import SHARD_AXIS

    s = mesh.shape[SHARD_AXIS]
    assert index.n_clusters % s == 0, (index.n_clusters, s)
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))  # noqa: E731
    return IVFIndex(
        centroids=put(index.centroids, P()),
        centroid_bias=put(index.centroid_bias, P()),
        clustered=put(index.clustered, P(SHARD_AXIS, None, None)),
        clustered_ids=put(index.clustered_ids, P(SHARD_AXIS, None)),
        clustered_bias=put(index.clustered_bias, P(SHARD_AXIS, None)),
        spill=put(index.spill, P()),
        spill_ids=put(index.spill_ids, P()),
        spill_bias=put(index.spill_bias, P()),
        clustered_scale=None if index.clustered_scale is None
        else put(index.clustered_scale, P(SHARD_AXIS, None)),
        spill_scale=None if index.spill_scale is None
        else put(index.spill_scale, P()),
        n=index.n, metric=index.metric, normalized=index.normalized,
        # the sharded path scans its cluster partition in place; a
        # replicated flat sibling would cost HBM on every chip for no win
        flat=None,
        n_spill=index.n_spill,
    )


def ivf_search_sharded(
    index: IVFIndex,
    queries: jax.Array,  # [B, D]
    mesh,
    k: int = 10,
    nprobe: int = 8,
    ignore: jax.Array | None = None,  # [B, I] int32 global doc ids, -1 pad
):
    """Probed search over a cluster-partitioned index: every shard probes
    the subset of the batch's top-nprobe clusters it owns, searches its
    local gathered payload, and per-shard top-k merge via all_gather over
    ICI (same merge as the sharded flat index).

    ``ignore`` implements the reference's self-exclusion protocol
    (sotasum/mips.py:388-400: the query's own articles are dropped from
    results): each shard returns k + I candidates, matches against the
    ignore ids after the global merge, and re-selects the top-k.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import SHARD_AXIS
    from .flat import _merge_topk

    extra = 0 if ignore is None else ignore.shape[1]
    k_fetch = k + extra
    b, d = queries.shape
    d_pad = index.dim
    c = index.n_clusters
    nprobe = min(nprobe, c)
    q = queries.astype(jnp.float32)
    if index.normalized and index.metric == "ip":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    if d != d_pad:
        q = jnp.zeros((b, d_pad), q.dtype).at[:, :d].set(q)

    cscores = q @ index.centroids.T + index.centroid_bias[None, :]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, nprobe] global ids

    n_shards = mesh.shape[SHARD_AXIS]
    c_local = c // n_shards
    cap = min(c_local, b * nprobe)
    # same routing predicate as the unsharded `ivf_search` (results must
    # match it exactly — DP-invariance): at training shapes the probe
    # union covers every cluster, so each shard scans its local payload
    # in place instead of gathering the union
    scan_all = b * nprobe >= c

    def local(probe, clustered, cids, cbias, cscale):
        if scan_all:
            L = clustered.shape[1]
            corpus = clustered.reshape(c_local * L, d_pad)
            bias = cbias.reshape(-1)
            flat_ids = cids.reshape(-1)
            scale = None if cscale is None else cscale.reshape(-1)
        else:
            sid = jax.lax.axis_index(SHARD_AXIS)
            lo = sid * c_local
            mine = (probe - lo).reshape(-1)  # local ids; OOR → not mine
            flat = jnp.where((mine >= 0) & (mine < c_local), mine, c_local)
            union = _union_pad(flat, cap, sentinel=c_local)
            ok = union < c_local
            safe = jnp.where(ok, union, 0)
            sub = jnp.take(clustered, safe, axis=0)
            sub_bias = jnp.where(
                ok[:, None], jnp.take(cbias, safe, axis=0), NEG_INF
            )
            L = sub.shape[1]
            corpus = sub.reshape(cap * L, d_pad)
            bias = sub_bias.reshape(-1)
            flat_ids = jnp.take(cids, safe, axis=0).reshape(-1)
            scale = None
            if cscale is not None:
                scale = jnp.take(cscale, safe, axis=0).reshape(-1)
        vals, pos = mips_topk(q, corpus, k_fetch, bias, None, scale)
        ids = jnp.take(flat_ids, jnp.maximum(pos, 0))
        ids = jnp.where(pos >= 0, ids, -1)
        vals_s = jax.lax.all_gather(vals, SHARD_AXIS)
        ids_s = jax.lax.all_gather(ids, SHARD_AXIS)
        return _merge_topk(vals_s, ids_s, k_fetch)

    scale_spec = None if index.clustered_scale is None else P(SHARD_AXIS, None)
    vals, ids = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None), P(SHARD_AXIS, None, None),
                  P(SHARD_AXIS, None), P(SHARD_AXIS, None), scale_spec),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(probe, index.clustered, index.clustered_ids, index.clustered_bias,
      index.clustered_scale)

    # spill buffer searched once (replicated, tiny) and merged in
    s_vals, s_pos = mips_topk(
        q, index.spill, min(k_fetch, index.spill.shape[0]), index.spill_bias,
        None, index.spill_scale,
    )
    s_ids = jnp.where(s_pos >= 0, index.spill_ids[jnp.maximum(s_pos, 0)], -1)
    all_vals = jnp.concatenate([vals, s_vals], axis=1)
    all_ids = jnp.concatenate([ids, s_ids], axis=1)
    if ignore is not None:
        bad = (
            all_ids[:, :, None] == ignore[:, None, :].astype(jnp.int32)
        ).any(-1)
        all_vals = jnp.where(bad, NEG_INF, all_vals)
    top_vals, sel = jax.lax.top_k(all_vals, k)
    return top_vals, jnp.take_along_axis(all_ids, sel, axis=1)
