"""Loss variants + retriever metrics on known inputs."""

import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.retriever import (
    retriever_metrics,
    retriever_metrics_fixed,
)
from retrieval_augmented_mds_tpu.train import (
    label_smoothed_nll_loss_copy,
    label_smoothed_nll_loss_fairseq,
    label_smoothed_nll_loss_transformers,
    summarization_loss,
)


def _lp(seed=0, b=4, t=6, v=11):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    tgt = rng.integers(0, v, (b, t))
    return jnp.asarray(lp), jnp.asarray(tgt)


def test_transformers_loss_zero_smoothing_is_nll():
    lp, tgt = _lp()
    loss = summarization_loss(lp, tgt, 0.0, pad_id=-1)
    ref = -np.take_along_axis(np.asarray(lp), np.asarray(tgt)[..., None], -1)
    np.testing.assert_allclose(float(loss), ref.mean(), rtol=1e-5)


def test_transformers_loss_ignores_padding():
    lp, tgt = _lp(1)
    tgt = tgt.at[:, -2:].set(0)
    loss_full = summarization_loss(lp, tgt, 0.1, pad_id=-1)
    # mark last two positions as pad → loss changes and only counts active
    loss_masked = summarization_loss(lp, tgt.at[:, -2:].set(99), 0.1, pad_id=99)
    ref = np.asarray(lp)[:, :-2]
    reft = np.asarray(tgt)[:, :-2]
    nll = -np.take_along_axis(ref, reft[..., None], -1).mean()
    smooth = -ref.astype(np.float64).sum(-1).mean() / lp.shape[-1]
    np.testing.assert_allclose(
        float(loss_masked), 0.9 * nll + 0.1 * smooth, rtol=1e-4
    )
    assert float(loss_full) != float(loss_masked)


def test_copy_and_fairseq_variants_reduce_to_nll():
    lp, tgt = _lp(2)
    lc, nc = label_smoothed_nll_loss_copy(lp, tgt, 0.0)
    lf, nf = label_smoothed_nll_loss_fairseq(lp, tgt, 0.0)
    ref = -np.take_along_axis(np.asarray(lp), np.asarray(tgt)[..., None], -1).sum()
    np.testing.assert_allclose(float(nc), ref, rtol=1e-5)
    np.testing.assert_allclose(float(nf), ref, rtol=1e-5)
    # fairseq variant subtracts eps_i from the nll weight too
    lc1, _ = label_smoothed_nll_loss_copy(lp, tgt, 0.1)
    lf1, _ = label_smoothed_nll_loss_fairseq(lp, tgt, 0.1)
    assert float(lc1) != float(lf1)


def test_retriever_metrics_quirk_and_fixed():
    # query 0: hit at rank 1 (index 0); query 1: hit at rank 3 (index 2)
    pred = jnp.asarray([[1, 0, 0, 0], [0, 0, 1, 0]], jnp.float32)
    counts = jnp.asarray([1, 1])
    quirk = retriever_metrics(pred, counts)
    fixed = retriever_metrics_fixed(pred, counts)
    # reference quirk: 1/argmax → rank-1 hit contributes 0 (pretrain.py:72-74)
    np.testing.assert_allclose(float(quirk["reciprocal_rank"]), (0 + 0.5) / 2)
    np.testing.assert_allclose(float(fixed["reciprocal_rank"]), (1 + 1 / 3) / 2)
    np.testing.assert_allclose(float(quirk["recall"]), 1.0)
    # AP: q0 = 1.0, q1 = 1/3
    np.testing.assert_allclose(
        float(quirk["average_precision"]), (1.0 + 1 / 3) / 2, rtol=1e-6
    )


def test_metrics_no_hits():
    pred = jnp.zeros((2, 5))
    counts = jnp.asarray([2, 3])
    m = retriever_metrics_fixed(pred, counts)
    assert float(m["recall"]) == 0.0
    assert float(m["reciprocal_rank"]) == 0.0
    assert float(m["average_precision"]) == 0.0
