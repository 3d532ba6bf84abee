"""Native CPU baseline vs numpy, and as cross-oracle for the TPU kernel."""

import numpy as np

from retrieval_augmented_mds_tpu.utils.cpu_baseline import cpu_mips_search


def test_cpu_ip_matches_numpy():
    rng = np.random.default_rng(0)
    e = rng.standard_normal((2000, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    vals, idx = cpu_mips_search(e, q, 10)
    s = q @ e.T
    ref = np.argsort(-s, -1)[:, :10]
    assert np.array_equal(np.sort(idx, -1), np.sort(ref, -1))
    np.testing.assert_allclose(
        vals, np.take_along_axis(s, idx, -1), rtol=1e-4, atol=1e-4
    )
    # descending order
    assert np.all(np.diff(vals, axis=-1) <= 1e-6)


def test_cpu_l2_matches_numpy():
    rng = np.random.default_rng(1)
    e = rng.standard_normal((1500, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    _, idx = cpu_mips_search(e, q, 5, metric="l2")
    d2 = ((q[:, None] - e[None]) ** 2).sum(-1)
    ref = np.argsort(d2, -1)[:, :5]
    assert np.array_equal(np.sort(idx, -1), np.sort(ref, -1))


def test_cross_oracle_with_pallas_kernel():
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.ops import mips_topk

    rng = np.random.default_rng(2)
    e = rng.standard_normal((3000, 96)).astype(np.float32)
    q = rng.standard_normal((6, 96)).astype(np.float32)
    _, idx_cpu = cpu_mips_search(e, q, 10)
    _, idx_tpu = mips_topk(jnp.asarray(q), jnp.asarray(e), 10)
    assert np.array_equal(np.sort(idx_cpu, -1), np.sort(np.asarray(idx_tpu), -1))
