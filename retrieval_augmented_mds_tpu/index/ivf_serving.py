"""Per-query IVF search kernel for the serving regime.

The batched union-probe path (index/ivf.py) amortizes cluster reads over
the whole batch — right for training-sized batches. At serving batch
sizes (B ≤ ~16) this kernel reads EXACTLY each query's nprobe clusters
from HBM instead of streaming the whole corpus: traffic is
B·nprobe·cap·D bytes vs the flat scan's N·D.

v1 of this kernel (round 1) used grid = (B, nprobe) with one cluster per
grid step and lost to the flat scan on per-grid-step overhead (4.7 ms at
N=1M vs flat's 1.8 ms). This version collapses the grid to (B,) and
hand-pipelines the cluster stream inside the kernel: the clustered
payload stays in HBM (`memory_space=ANY`), probe ids arrive via scalar
prefetch, and a double-buffered `make_async_copy` chain overlaps the
next cluster's DMA with the current cluster's matmul + running top-k
merge (pallas_guide.md "Patterns: Double Buffering"). The probe loop is
fully unrolled (nprobe is static), so every buffer slot index is static.

The always-probed spill buffer is searched with the flat kernel and
merged outside (it is tiny by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.mips_topk import NEG_INF, _INT_MAX, _RUN, mips_topk
from .ivf import IVFIndex


def _kernel(
    probes_ref,  # scalar prefetch: [B * nprobe] int32 cluster ids
    q_ref,  # [1, 1, D] this query's block (VMEM)
    clustered_hbm,  # [C, L, D] full clustered payload (HBM)
    bias_hbm,  # [C, 1, L] row bias, −inf on pads (HBM)
    scale_hbm,  # [C, 1, L] row scale, 1.0 unless SQ8 (HBM)
    out_vals_ref,  # [1, 1, _RUN]
    out_pos_ref,  # [1, 1, _RUN] positions p*L+slot into the probed set
    ebuf,  # VMEM scratch [2, L, D] payload dtype
    bbuf,  # VMEM scratch [2, 1, L] f32
    sbuf,  # VMEM scratch [2, 1, L] f32
    esem,  # DMA semaphores (2,)
    bsem,
    ssem,
    *,
    k: int,
    L: int,
    nprobe: int,
):
    i = pl.program_id(0)

    def dmas(slot, p):
        cid = probes_ref[i * nprobe + p]
        return (
            pltpu.make_async_copy(
                clustered_hbm.at[cid], ebuf.at[slot], esem.at[slot]
            ),
            pltpu.make_async_copy(
                bias_hbm.at[cid], bbuf.at[slot], bsem.at[slot]
            ),
            pltpu.make_async_copy(
                scale_hbm.at[cid], sbuf.at[slot], ssem.at[slot]
            ),
        )

    for d in dmas(0, 0):
        d.start()

    q = q_ref[0].astype(jnp.float32)  # [1, D]
    run_vals = jnp.full((1, _RUN), NEG_INF, jnp.float32)
    run_pos = jnp.full((1, _RUN), _INT_MAX, jnp.int32)

    for p in range(nprobe):  # static unroll: slot indices stay static
        slot = p % 2
        if p + 1 < nprobe:
            for d in dmas((p + 1) % 2, p + 1):
                d.start()
        for d in dmas(slot, p):
            d.wait()

        e = ebuf[slot]  # [L, D]
        if e.dtype == jnp.int8:
            e = e.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q.astype(e.dtype) if e.dtype == jnp.bfloat16 else q, e,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, L]
        scores = scores * sbuf[slot] + bbuf[slot]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) + p * L

        cand_vals = jnp.concatenate([scores, run_vals], axis=-1)
        cand_pos = jnp.concatenate([pos, run_pos], axis=-1)
        nv, npos = [], []
        for _ in range(k):
            m = jnp.max(cand_vals, axis=-1)
            hit = cand_vals == m[:, None]
            picked = jnp.min(jnp.where(hit, cand_pos, _INT_MAX), axis=-1)
            nv.append(m)
            npos.append(picked)
            cand_vals = jnp.where(hit, NEG_INF, cand_vals)
        pad = _RUN - k
        run_vals = jnp.pad(
            jnp.stack(nv, -1), ((0, 0), (0, pad)), constant_values=NEG_INF
        )
        run_pos = jnp.pad(
            jnp.stack(npos, -1), ((0, 0), (0, pad)), constant_values=_INT_MAX
        )

    out_vals_ref[0] = run_vals
    out_pos_ref[0] = run_pos


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "interpret"))
def ivf_search_serving(
    index: IVFIndex,
    queries: jax.Array,  # [B, D]
    k: int = 10,
    nprobe: int = 8,
    ignore: jax.Array | None = None,  # [B, I] int32 global doc ids, -1 pad
    *,
    interpret: bool | None = None,
):
    """Per-query probed search. Returns (scores [B, k], doc ids [B, k]).

    ``ignore`` implements the reference self-exclusion protocol
    (sotasum/mips.py:388-400): the kernel fetches k + I candidates per
    query, ignore matches are masked after the spill merge, and the
    final top-k re-selects."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    extra = 0 if ignore is None else ignore.shape[1]
    k_fetch = k + extra
    b, d = queries.shape
    d_pad = index.dim
    c = index.n_clusters
    L = index.clustered.shape[1]
    nprobe = min(nprobe, c)
    assert k_fetch <= _RUN

    q = queries.astype(jnp.float32)
    if index.normalized and index.metric == "ip":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    if d != d_pad:
        q = jnp.zeros((b, d_pad), q.dtype).at[:, :d].set(q)

    cscores = q @ index.centroids.T + index.centroid_bias[None, :]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, nprobe]
    probes_flat = probe.reshape(-1).astype(jnp.int32)

    scale = index.clustered_scale
    if scale is None:
        scale = jnp.ones_like(index.clustered_bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, d_pad), lambda i, pr: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # clustered stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # bias
            pl.BlockSpec(memory_space=pl.ANY),  # scale
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _RUN), lambda i, pr: (i, 0, 0)),
            pl.BlockSpec((1, 1, _RUN), lambda i, pr: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, d_pad), index.clustered.dtype),
            pltpu.VMEM((2, 1, L), jnp.float32),
            pltpu.VMEM((2, 1, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals, pos = pl.pallas_call(
        functools.partial(_kernel, k=k_fetch, L=L, nprobe=nprobe),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, _RUN), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, _RUN), jnp.int32),
        ],
        interpret=interpret,
    )(
        probes_flat,
        q[:, None, :],
        index.clustered,
        index.clustered_bias[:, None, :],
        scale[:, None, :],
    )
    vals = vals[:, 0, :k_fetch]
    pos = pos[:, 0, :k_fetch]

    # map probed-set positions → global doc ids
    probe_slot = jnp.clip(pos // L, 0, nprobe - 1)
    slot = jnp.clip(pos % L, 0, L - 1)
    cluster = jnp.take_along_axis(probe, probe_slot, axis=1)  # [B, kk]
    ids = index.clustered_ids[cluster, slot]
    ids = jnp.where(pos == _INT_MAX, -1, ids)

    # spill buffer (tiny, always probed) via the flat kernel, then merge
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
    top_vals, top_sel = jax.lax.top_k(all_vals, k)
    top_ids = jnp.take_along_axis(all_ids, top_sel, axis=1)
    top_ids = jnp.where(top_vals > NEG_INF / 2, top_ids, -1)
    return top_vals, top_ids
