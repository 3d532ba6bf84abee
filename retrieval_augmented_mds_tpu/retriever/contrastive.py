"""Dual-encoder retriever pretraining: in-batch InfoNCE + BOW auxiliary loss.

Rebuilds `RetrieverLightning` (sotasum/retriever_lightning.py:90-444 and the
legacy sotasum/pretrain.py:182-564): two Longformer encoders (query side and
index side), CLS pooling with optional projection to a pooled dim, and an
in-batch contrastive loss — scores = query_cls @ mips_cls^T / temperature
against the diagonal target (retriever_lightning.py:230-236). On a mesh the
batch is gathered over the data axis first, so every device contrasts
against the GLOBAL batch (more negatives than the reference's per-GPU
batch — strictly stronger training signal).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.config import EncoderConfig
from ..models.core import Params, dense, dense_init
from ..models.longformer import init_longformer, longformer_encode
from ..parallel.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    """Reference RetrieverConfig (sotasum/retriever_lightning.py:27-51)."""

    query_enc: EncoderConfig
    mips_enc: EncoderConfig
    temperature: float = 1.0
    pooling_dim: int | None = None  # 128-d projections (:142-153)
    token_loss: bool = False  # BOW auxiliary loss (:155-163)

    @staticmethod
    def tiny(**kw) -> "RetrieverConfig":
        enc = EncoderConfig.tiny()
        d = dict(query_enc=enc, mips_enc=enc)
        d.update(kw)
        return RetrieverConfig(**d)


def init_bow(key, d_model: int) -> Params:
    """BOWModel (retriever_lightning.py:447-481): proj + tied output."""
    return {"proj": dense_init(key, d_model, d_model)}


def init_retriever(key, cfg: RetrieverConfig) -> Params:
    ks = jax.random.split(key, 6)
    p: Params = {
        "query_encoder": init_longformer(ks[0], cfg.query_enc),
        "mips_encoder": init_longformer(ks[1], cfg.mips_enc),
    }
    if cfg.pooling_dim:
        p["query_proj"] = dense_init(ks[2], cfg.query_enc.d_model, cfg.pooling_dim)
        p["mips_proj"] = dense_init(ks[3], cfg.mips_enc.d_model, cfg.pooling_dim)
    if cfg.token_loss:
        p["query_bow"] = init_bow(ks[4], cfg.query_enc.d_model)
        p["mips_bow"] = init_bow(ks[5], cfg.mips_enc.d_model)
    return p


def bow_loss(
    bow: Params,
    emb_table: jnp.ndarray,  # [V, H] tied embedding
    cls: jnp.ndarray,  # [B, H]
    label_ids: jnp.ndarray,  # [B, L]
    attention_mask: jnp.ndarray,  # [B, L]
    cfg: EncoderConfig,
) -> jnp.ndarray:
    """Bag-of-words reconstruction of the OTHER side's tokens from CLS."""
    logits = jnp.einsum(
        "bh,vh->bv", dense(bow["proj"], cls), emb_table,
        preferred_element_type=jnp.float32,
    )
    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, jnp.maximum(label_ids, 0), axis=-1)
    drop = (
        (label_ids == cfg.bos_id)
        | (label_ids == cfg.eos_id)
        | (attention_mask == 0)
    )
    nll = jnp.where(drop, 0.0, nll)
    return jnp.mean(jnp.sum(nll, axis=-1))


def retriever_forward(
    params: Params,
    cfg: RetrieverConfig,
    batch: dict[str, Any],
    *,
    dtype=jnp.float32,
    remat: bool | str = False,
):
    """Returns (query_cls [B, P], mips_cls [B, P])."""
    qh = longformer_encode(
        params["query_encoder"], cfg.query_enc, batch["query_input_ids"],
        batch["query_attention_mask"], dtype=dtype, remat=remat,
    )
    mh = longformer_encode(
        params["mips_encoder"], cfg.mips_enc, batch["mips_input_ids"],
        batch["mips_attention_mask"], dtype=dtype, remat=remat,
    )
    q = qh[:, 0].astype(jnp.float32)
    m = mh[:, 0].astype(jnp.float32)
    if cfg.pooling_dim:
        q = dense(params["query_proj"], q)
        m = dense(params["mips_proj"], m)
    return q, m


def contrastive_loss(
    params: Params,
    cfg: RetrieverConfig,
    batch: dict[str, Any],
    *,
    dtype=jnp.float32,
    remat: bool | str = False,
    gather_axis: str | None = None,  # DATA_AXIS for global in-batch negatives
):
    """InfoNCE + optional BOW. Returns (loss, metrics dict)."""
    q, m = retriever_forward(params, cfg, batch, dtype=dtype, remat=remat)
    if gather_axis is not None:
        # global negatives across the data axis (all_gather over ICI)
        q_all = jax.lax.all_gather(q, gather_axis, tiled=True)
        m_all = jax.lax.all_gather(m, gather_axis, tiled=True)
        rank = jax.lax.axis_index(gather_axis)
        offset = rank * q.shape[0]
    else:
        q_all, m_all, offset = q, m, 0

    scores = (q @ m_all.T) / cfg.temperature  # [B_local, B_global]
    target = jnp.arange(q.shape[0]) + offset
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(scores, target)
    )
    metrics = {"sentence_loss": loss}

    if cfg.token_loss:
        # reconstruct query tokens from the mips CLS and vice versa
        # (retriever_lightning.py:241-252: query_bow(mips_cls, query_ids))
        ql = bow_loss(
            params["query_bow"],
            params["query_encoder"]["tok_emb"]["table"],
            m, batch["query_input_ids"], batch["query_attention_mask"],
            cfg.query_enc,
        )
        ml = bow_loss(
            params["mips_bow"],
            params["mips_encoder"]["tok_emb"]["table"],
            q, batch["mips_input_ids"], batch["mips_attention_mask"],
            cfg.mips_enc,
        )
        metrics["token_loss"] = ql + ml
        loss = loss + ql + ml

    # in-batch top-1 train accuracy probe (retriever_lightning.py:273-277)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    mn = m_all / jnp.maximum(
        jnp.linalg.norm(m_all, axis=-1, keepdims=True), 1e-12
    )
    acc = jnp.mean((jnp.argmax(qn @ mn.T, -1) == target).astype(jnp.float32))
    metrics["train_accuracy"] = jax.lax.stop_gradient(acc)
    metrics["loss"] = loss
    return loss, metrics
