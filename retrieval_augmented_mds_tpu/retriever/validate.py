"""Retriever validation against the full encoded knowledge base.

Rebuilds `on_validation_start` + `validation_step` of the retriever
pretraining (sotasum/retriever_lightning.py:339-416, legacy
sotasum/pretrain.py:408-529): encode the ENTIRE corpus with the current
index-side encoder, build an index (φ-augmented when the configured
metric is L2 — same trick the reference applies at :379-393), then for
each eval query: encode → top-k search → hit matrix vs gold aid →
recall / MRR / MAP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..index import augment_corpus, augment_queries, build_flat_index, search
from ..models.longformer import longformer_encode
from .metrics import retriever_metrics_fixed


def encode_texts(params, cfg, ids, mask, batch_size=64, dtype=jnp.float32,
                 proj=None):
    outs = []
    n = ids.shape[0]
    pad = (-n) % batch_size

    @jax.jit
    def enc(i, m):
        cls = longformer_encode(params, cfg, i, m, dtype=dtype)[:, 0]
        if proj is not None:
            # pooled projection (reference retriever_lightning.py:142-153)
            from ..models.core import dense

            cls = dense(proj, cls.astype(jnp.float32))
        return cls

    idsp = np.concatenate([ids, np.tile(ids[:1], (pad, 1))]) if pad else ids
    maskp = np.concatenate([mask, np.tile(mask[:1], (pad, 1))]) if pad else mask
    for i in range(0, len(idsp), batch_size):
        outs.append(np.asarray(enc(jnp.asarray(idsp[i:i + batch_size]),
                                   jnp.asarray(maskp[i:i + batch_size]))))
    return np.concatenate(outs)[:n].astype(np.float32)


def validate_retriever(
    params: dict,
    query_cfg,
    mips_cfg,
    corpus_tokens: dict[str, np.ndarray],  # token_ids/token_mask [N, L]
    corpus_row_aids: np.ndarray,  # [N, A] int32 (−1 pad)
    queries: dict[str, np.ndarray],  # query_input_ids/mask [Q, L]
    gold_aid: np.ndarray,  # [Q] int32
    gold_counts: np.ndarray,  # [Q]
    *,
    k: int = 10,
    metric: str = "ip",
    batch_size: int = 64,
    return_details: bool = False,
):
    """Returns the metric dict; with ``return_details`` also the per-query
    ranking (retrieved indices, scores, hit matrix — the reference
    predict-mode payload, sotasum/pretrain.py:686-718 /
    retriever_lightning.py:283-337)."""
    kb = encode_texts(
        params["mips_encoder"], mips_cfg,
        corpus_tokens["token_ids"], corpus_tokens["token_mask"], batch_size,
        proj=params.get("mips_proj"),
    )
    q = encode_texts(
        params["query_encoder"], query_cfg,
        queries["query_input_ids"], queries["query_attention_mask"], batch_size,
        proj=params.get("query_proj"),
    )
    if metric == "l2":
        # φ-augmentation so L2 search realizes MIPS (reference :379-393)
        kb_aug, _ = augment_corpus(jnp.asarray(kb))
        q_aug = augment_queries(jnp.asarray(q))
        index = build_flat_index(np.asarray(kb_aug), metric="l2",
                                 dtype=jnp.float32)
        scores, idx = search(index, q_aug, k=k)
    else:
        index = build_flat_index(kb, metric="ip", dtype=jnp.float32)
        scores, idx = search(index, jnp.asarray(q), k=k)

    idx = np.asarray(idx)
    retrieved_aids = corpus_row_aids[np.maximum(idx, 0)]  # [Q, k, A]
    hits = (retrieved_aids == gold_aid[:, None, None]).any(-1)
    m = retriever_metrics_fixed(jnp.asarray(hits), jnp.asarray(gold_counts))
    out = {key: float(v) for key, v in m.items()}
    if return_details:
        return out, {
            "indices": idx,
            "scores": np.asarray(scores),
            "hits": np.asarray(hits),
        }
    return out
