"""Retriever ranking metrics: recall@k, MRR, MAP.

Port of `retriever_metrics` (sotasum/pretrain.py:69-85, re-imported by the
MIPS engine at sotasum/mips.py:14 and logged during training at
mips.py:456-463). Two variants:

  * `retriever_metrics` — bit-exact semantics, INCLUDING the reference's
    MRR quirk: `1/argmax(pred)` means a rank-1 hit (index 0) produces
    1/0 = inf which is masked to 0 (pretrain.py:72-74), and a no-hit row
    contributes 1/0 → 0 as well. Kept for metric-parity comparisons.
  * `retriever_metrics_fixed` — the intended reciprocal rank
    (1/(argmax+1), 0 when there is no hit). SURVEY.md §7.3 flags this
    decision; both are exposed and the trainer logs the fixed one.
"""

from __future__ import annotations

import jax.numpy as jnp


def retriever_metrics(pred: jnp.ndarray, counts: jnp.ndarray) -> dict:
    """pred: [B, k] {0,1} hit matrix (ranked); counts: [B] gold set sizes."""
    pred = pred.astype(jnp.float32)
    counts = jnp.maximum(counts.astype(jnp.float32), 1)
    recall = jnp.mean(jnp.sum(pred, -1) / counts)

    am = jnp.argmax(pred, -1).astype(jnp.float32)
    rr = jnp.where(am == 0, 0.0, 1.0 / jnp.where(am == 0, 1.0, am))
    mrr = jnp.mean(rr)

    ranks = jnp.arange(1, pred.shape[-1] + 1, dtype=jnp.float32)
    precision = (jnp.cumsum(pred, -1) / ranks) * pred
    ap = jnp.mean(jnp.sum(precision, -1) / counts)
    return {"recall": recall, "reciprocal_rank": mrr, "average_precision": ap}


def retriever_metrics_fixed(pred: jnp.ndarray, counts: jnp.ndarray) -> dict:
    pred = pred.astype(jnp.float32)
    counts = jnp.maximum(counts.astype(jnp.float32), 1)
    recall = jnp.mean(jnp.sum(pred, -1) / counts)

    any_hit = jnp.any(pred > 0, -1)
    first = jnp.argmax(pred, -1).astype(jnp.float32)
    rr = jnp.where(any_hit, 1.0 / (first + 1.0), 0.0)
    mrr = jnp.mean(rr)

    ranks = jnp.arange(1, pred.shape[-1] + 1, dtype=jnp.float32)
    precision = (jnp.cumsum(pred, -1) / ranks) * pred
    ap = jnp.mean(jnp.sum(precision, -1) / counts)
    return {"recall": recall, "reciprocal_rank": mrr, "average_precision": ap}


def hits_from_aids(
    retrieved_aids: jnp.ndarray,  # [B, k, A] aid lists of retrieved rows
    gold_aid: jnp.ndarray,  # [B] gold aid per query
) -> jnp.ndarray:
    """[B, k] hit matrix: retrieved row lists the gold aid
    (reference builds this from Arrow rows at sotasum/mips.py:458-462)."""
    return (retrieved_aids == gold_aid[:, None, None]).any(-1)
