"""Label-smoothed NLL losses — all four reference variants.

Ports of sotasum/loss.py (semantics preserved, including the quirks each
variant carries; the trainer uses the "transformers" one, which the
reference invokes on *negated* log-probs at sotasum/lightning_model.py:
282-287 — `summarization_loss` wraps that calling convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_last(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def label_smoothed_nll_loss_copy(
    lprobs, target, epsilon, ignore_index=None, sum=True
):
    """sotasum/loss.py:4-22 ("copy-is-all-you-need" variant)."""
    nll = -_gather_last(lprobs, jnp.maximum(target, 0))
    smooth = -jnp.sum(lprobs, axis=-1)
    if ignore_index is not None:
        keep = target != ignore_index
        nll = jnp.where(keep, nll, 0.0)
        smooth = jnp.where(keep, smooth, 0.0)
    if sum:
        nll, smooth = jnp.sum(nll), jnp.sum(smooth)
    eps_i = epsilon / lprobs.shape[-1]
    return (1.0 - epsilon) * nll + eps_i * smooth, nll


def label_smoothed_nll_loss_fairseq(
    lprobs, target, epsilon, ignore_index=None, reduce=True
):
    """sotasum/loss.py:25-43 (fairseq variant)."""
    nll = -_gather_last(lprobs, jnp.maximum(target, 0))
    smooth = -jnp.sum(lprobs, axis=-1)
    if ignore_index is not None:
        keep = target != ignore_index
        nll = jnp.where(keep, nll, 0.0)
        smooth = jnp.where(keep, smooth, 0.0)
    if reduce:
        nll, smooth = jnp.sum(nll), jnp.sum(smooth)
    eps_i = epsilon / (lprobs.shape[-1] - 1)
    return (1.0 - epsilon - eps_i) * nll + eps_i * smooth, nll


def label_smoothed_nll_loss_custom(
    lprobs, target, epsilon, ignore_index=None, reduce=None
):
    """sotasum/loss.py:46-74."""
    eps_i = epsilon / (lprobs.shape[-1] - 1)
    nll = -_gather_last(lprobs, jnp.maximum(target, 0))
    smooth = -jnp.sum(lprobs * eps_i, axis=-1)
    count = None
    if ignore_index is not None:
        keep = target != ignore_index
        nll = jnp.where(keep, nll, 0.0)
        smooth = jnp.where(keep, smooth, 0.0)
        count = jnp.sum(keep)
    if reduce == "sum":
        nll, smooth = jnp.sum(nll), jnp.sum(smooth)
    elif reduce == "mean":
        nll = jnp.sum(nll) / count
        smooth = jnp.sum(smooth) / count
    return (1.0 - epsilon - eps_i) * nll + smooth, nll


def label_smoothed_nll_loss_transformers(
    log_probs, labels, epsilon, ignore_index
):
    """sotasum/loss.py:77-102 — HF LabelSmoother semantics. NOTE: like the
    reference call site, ``log_probs`` here are NEGATED log-probs. Smooth
    term upcast to f32 (loss.py:92); mean over active tokens (loss.py:96-102).
    """
    keep = labels != ignore_index
    safe = jnp.maximum(labels, 0)
    nll = jnp.where(keep, _gather_last(log_probs, safe), 0.0)
    smooth = jnp.where(
        keep, jnp.sum(log_probs.astype(jnp.float32), axis=-1), 0.0
    )
    n_active = jnp.maximum(jnp.sum(keep), 1)
    nll = jnp.sum(nll) / n_active
    smooth = jnp.sum(smooth) / (n_active * log_probs.shape[-1])
    return (1.0 - epsilon) * nll + epsilon * smooth


def summarization_loss(log_probs, labels, epsilon, pad_id):
    """The trainer's loss: real log-probs in, scalar out (mirrors
    sotasum/lightning_model.py:282-287 which negates before calling)."""
    v = log_probs.shape[-1]
    return label_smoothed_nll_loss_transformers(
        -log_probs.reshape(-1, v), labels.reshape(-1), epsilon, pad_id
    )
