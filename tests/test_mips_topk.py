"""Pallas MIPS top-k kernel vs XLA and numpy brute force.

Mirrors the reference's only coherent numerical check — the brute-force
inner-product comparison at sotasum/mips.py:552-560 / :655-686 — but as a
real test with recall and score-parity assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.ops import mips_topk, mips_topk_xla


def _brute(q, e, k, bias=None):
    s = q.astype(np.float32) @ e.astype(np.float32).T
    if bias is not None:
        s = s + bias[None, :]
    idx = np.argsort(-s, axis=-1)[:, :k]
    vals = np.take_along_axis(s, idx, axis=-1)
    return vals, idx


@pytest.mark.parametrize("n,d,b,k", [(1000, 64, 4, 5), (4096, 256, 16, 10)])
def test_flat_matches_brute_force(n, d, b, k):
    rng = np.random.default_rng(0)
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ref_vals, ref_idx = _brute(q, e, k)

    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), k)
    # exact f32 corpus → exact match of the retrieved set
    assert np.array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=2e-5, atol=2e-5)


def test_bf16_corpus_high_recall():
    rng = np.random.default_rng(1)
    n, d, b, k = 8192, 128, 8, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    _, ref_idx = _brute(q, e, k)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e, dtype=jnp.bfloat16), k)
    hits = sum(
        len(set(np.asarray(idx)[i]) & set(ref_idx[i])) for i in range(b)
    )
    assert hits / (b * k) >= 0.95  # bf16 rounding may flip near-ties only


def test_matches_xla_reference_with_bias_and_ignore():
    rng = np.random.default_rng(2)
    n, d, b, k = 2048, 96, 8, 8
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)
    ignore = rng.integers(0, n, size=(b, 3)).astype(np.int32)

    v1, i1 = mips_topk(
        jnp.asarray(q), jnp.asarray(e), k, jnp.asarray(bias), jnp.asarray(ignore)
    )
    v2, i2 = mips_topk_xla(
        jnp.asarray(q), jnp.asarray(e), k, jnp.asarray(bias), jnp.asarray(ignore)
    )
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-5, atol=2e-5)
    # excluded ids never returned
    for r in range(b):
        assert not (set(np.asarray(i1)[r]) & set(ignore[r]))


def test_l2_metric_via_row_bias():
    """min-L2 == max-(q·e - ||e||²/2): the on-device replacement for the
    reference's φ-augmentation MIPS→L2 trick (sotasum/mips.py:55-70)."""
    rng = np.random.default_rng(3)
    n, d, b, k = 1024, 32, 4, 5
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    bias = -0.5 * (e * e).sum(-1)

    d2 = ((q[:, None, :] - e[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(d2, axis=-1)[:, :k]

    _, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), k, jnp.asarray(bias))
    assert np.array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))


def test_unaligned_shapes():
    rng = np.random.default_rng(4)
    n, d, b, k = 777, 50, 3, 7
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ref_vals, ref_idx = _brute(q, e, k)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), k)
    assert np.array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))


def test_blocked_matches_fused():
    from retrieval_augmented_mds_tpu.ops.mips_topk import mips_topk_blocked

    rng = np.random.default_rng(7)
    n, d, b, k = 4096, 64, 8, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)
    ignore = rng.integers(0, n, size=(b, 2)).astype(np.int32)
    v1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(e), k,
                       jnp.asarray(bias), jnp.asarray(ignore))
    v2, i2 = mips_topk_blocked(jnp.asarray(q), jnp.asarray(e), k,
                               jnp.asarray(bias), jnp.asarray(ignore))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_edge_small_corpus_k_exceeds_n():
    """k > n: missing slots padded with -1 / NEG_INF-ish values."""
    rng = np.random.default_rng(10)
    e = rng.standard_normal((5, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 8)
    idx = np.asarray(idx)
    assert set(idx[0][:5]) == set(range(5))
    assert (idx[:, 5:] == -1).all()


def test_edge_single_query_single_k():
    rng = np.random.default_rng(11)
    e = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((1, 32)).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 1)
    assert int(idx[0, 0]) == int(np.argmax(q @ e.T))


def test_edge_large_dim():
    rng = np.random.default_rng(12)
    e = rng.standard_normal((600, 1536)).astype(np.float32)
    q = rng.standard_normal((3, 1536)).astype(np.float32)
    _, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 4)
    ref = np.argsort(-(q @ e.T), -1)[:, :4]
    assert np.array_equal(np.sort(np.asarray(idx), -1), np.sort(ref, -1))


def test_edge_all_ignored_rows_return_minus_one():
    rng = np.random.default_rng(13)
    e = rng.standard_normal((8, 16)).astype(np.float32)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    ignore = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 3, None, ignore)
    assert (np.asarray(idx) == -1).all()


def test_l2_with_sq8_payload():
    """L2 metric composed with int8 quantization (bias post-scale)."""
    from retrieval_augmented_mds_tpu.ops.mips_topk import quantize_corpus_sq8

    rng = np.random.default_rng(14)
    n, d, b, k = 2048, 64, 6, 8
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q8, s8 = quantize_corpus_sq8(jnp.asarray(e))
    bias = -0.5 * (e * e).sum(-1)

    d2 = ((q[:, None] - e[None]) ** 2).sum(-1)
    ref = np.argsort(d2, -1)[:, :k]
    _, idx = mips_topk(jnp.asarray(q), q8, k, jnp.asarray(bias), None, s8)
    idx = np.asarray(idx)
    hits = sum(len(set(idx[i]) & set(ref[i])) for i in range(b))
    assert hits / (b * k) >= 0.9
