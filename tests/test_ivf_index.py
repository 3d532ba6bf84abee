"""IVF index: k-means sanity + recall vs flat truth + nprobe monotonicity."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.index.ivf import build_ivf_index, ivf_search, kmeans


def _clustered_data(n=4096, d=64, n_true=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = 5.0 * rng.standard_normal((n_true, d))
    a = rng.integers(0, n_true, n)
    x = centers[a] + rng.standard_normal((n, d))
    return x.astype(np.float32)


def _recall(ids, ref):
    b, k = ref.shape
    return sum(len(set(ids[i]) & set(ref[i])) for i in range(b)) / (b * k)


def test_kmeans_reduces_distortion():
    x = jnp.asarray(_clustered_data())
    key = jax.random.PRNGKey(0)
    cent, assign = kmeans(x, key, 32, iters=10)

    def distortion(c):
        d2 = ((x[:, None] - c[None]) ** 2).sum(-1)
        return float(d2.min(-1).mean())

    c_rand = jax.random.choice(key, x, shape=(32,), replace=False)
    assert distortion(cent) < 0.5 * distortion(c_rand)
    assert int(assign.min()) >= 0 and int(assign.max()) < 32


def test_ivf_high_recall_on_clustered_data():
    x = _clustered_data(n=4096, d=64)
    rng = np.random.default_rng(1)
    q = x[rng.integers(0, len(x), 16)] + 0.1 * rng.standard_normal((16, 64)).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=32, dtype=jnp.float32, seed=0)

    s = q.astype(np.float32) @ x.T
    ref = np.argsort(-s, -1)[:, :10]

    _, ids = ivf_search(idx, jnp.asarray(q), k=10, nprobe=8)
    assert _recall(np.asarray(ids), ref) >= 0.9


def test_nprobe_monotone_recall():
    x = _clustered_data(n=2048, d=32, seed=2)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=16, dtype=jnp.float32)
    s = q @ x.T
    ref = np.argsort(-s, -1)[:, :5]
    recalls = []
    for nprobe in (1, 4, 16):
        _, ids = ivf_search(idx, jnp.asarray(q), k=5, nprobe=nprobe)
        recalls.append(_recall(np.asarray(ids), ref))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # nprobe = C + spill ⇒ exhaustive ⇒ exact


def test_no_document_dropped():
    """Overflow rows land in the spill buffer, not the floor."""
    x = _clustered_data(n=512, d=32, n_true=2, seed=4)  # very unbalanced
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32, alpha=1.0)
    got = set(np.asarray(idx.clustered_ids).ravel().tolist()) | set(
        np.asarray(idx.spill_ids).ravel().tolist()
    )
    got.discard(-1)
    assert got == set(range(512))


def test_ivf_self_exclusion():
    x = _clustered_data(n=1024, d=32, seed=5)
    q = x[:4]  # query == corpus rows
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32)
    ignore = jnp.asarray(np.arange(4, dtype=np.int32)[:, None])
    _, ids = ivf_search(idx, jnp.asarray(q), k=5, nprobe=8, ignore=ignore)
    ids = np.asarray(ids)
    for r in range(4):
        assert r not in set(ids[r])


def test_serving_kernel_matches_union_probe():
    from retrieval_augmented_mds_tpu.index.ivf_serving import ivf_search_serving

    x = _clustered_data(n=2048, d=64, n_true=16, seed=6)
    rng = np.random.default_rng(7)
    q = x[rng.integers(0, len(x), 4)] + 0.05 * rng.standard_normal(
        (4, 64)
    ).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=16, dtype=jnp.float32, seed=1)

    v1, i1 = ivf_search(idx, jnp.asarray(q), k=5, nprobe=16)  # exhaustive
    v2, i2 = ivf_search_serving(idx, jnp.asarray(q), k=5, nprobe=16)
    # both exhaustive → identical sets
    assert np.array_equal(
        np.sort(np.asarray(i1), -1), np.sort(np.asarray(i2), -1)
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(v1), -1), np.sort(np.asarray(v2), -1), rtol=1e-5
    )


def test_serving_kernel_recall():
    from retrieval_augmented_mds_tpu.index.ivf_serving import ivf_search_serving

    x = _clustered_data(n=4096, d=64, seed=8)
    rng = np.random.default_rng(9)
    q = x[rng.integers(0, len(x), 8)] + 0.1 * rng.standard_normal(
        (8, 64)
    ).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=32, dtype=jnp.float32, seed=2)
    s = q @ x.T
    ref = np.argsort(-s, -1)[:, :10]
    _, ids = ivf_search_serving(idx, jnp.asarray(q), k=10, nprobe=8)
    assert _recall(np.asarray(ids), ref) >= 0.85


def test_ivf_sq8_payload():
    from retrieval_augmented_mds_tpu.index.ivf_serving import ivf_search_serving

    x = _clustered_data(n=2048, d=64, seed=10)
    rng = np.random.default_rng(11)
    q = x[rng.integers(0, len(x), 8)] + 0.1 * rng.standard_normal(
        (8, 64)
    ).astype(np.float32)
    idx8 = build_ivf_index(x, n_clusters=16, dtype="int8", seed=3)
    assert idx8.clustered.dtype == jnp.int8
    assert idx8.clustered_scale is not None

    s = q @ x.T
    ref = np.argsort(-s, -1)[:, :10]
    _, ids = ivf_search(idx8, jnp.asarray(q), k=10, nprobe=8)
    assert _recall(np.asarray(ids), ref) >= 0.8
    _, ids2 = ivf_search_serving(idx8, jnp.asarray(q), k=10, nprobe=8)
    assert _recall(np.asarray(ids2), ref) >= 0.8


def test_factory_sq8_builds_int8():
    from retrieval_augmented_mds_tpu.index import build_index_from_factory

    x = _clustered_data(n=512, d=32, seed=12)
    idx = build_index_from_factory(x, "IVF16,SQ8", dtype=jnp.float32)
    assert idx.clustered.dtype == jnp.int8


def test_ivf_save_load_roundtrip(tmp_path):
    from retrieval_augmented_mds_tpu.index.ivf import (
        load_ivf_index,
        save_ivf_index,
    )

    x = _clustered_data(n=1024, d=32, seed=13)
    rng = np.random.default_rng(13)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    for dtype in (jnp.float32, jnp.bfloat16, "int8"):
        idx = build_ivf_index(x, n_clusters=8, dtype=dtype, seed=4)
        save_ivf_index(idx, str(tmp_path / f"ivf_{dtype}"))
        idx2 = load_ivf_index(str(tmp_path / f"ivf_{dtype}"))
        v1, i1 = ivf_search(idx, jnp.asarray(q), k=5, nprobe=4)
        v2, i2 = ivf_search(idx2, jnp.asarray(q), k=5, nprobe=4)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_sharded_ivf_matches_unsharded():
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 simulated devices")
    from retrieval_augmented_mds_tpu.index.ivf import (
        ivf_search_sharded,
        shard_ivf_index,
    )
    from retrieval_augmented_mds_tpu.parallel import MeshSpec

    mesh = MeshSpec(1, 8).build()
    x = _clustered_data(n=4096, d=64, n_true=32, seed=14)
    rng = np.random.default_rng(15)
    q = x[rng.integers(0, len(x), 8)] + 0.05 * rng.standard_normal(
        (8, 64)
    ).astype(np.float32)

    idx = build_ivf_index(x, n_clusters=32, dtype=jnp.float32, seed=5)
    v_ref, i_ref = ivf_search(idx, jnp.asarray(q), k=10, nprobe=8)

    sharded = shard_ivf_index(idx, mesh)
    v_s, i_s = ivf_search_sharded(sharded, jnp.asarray(q), mesh, k=10,
                                  nprobe=8)
    assert np.array_equal(
        np.sort(np.asarray(i_ref), -1), np.sort(np.asarray(i_s), -1)
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(v_ref), -1), np.sort(np.asarray(v_s), -1),
        rtol=1e-5,
    )


def test_sharded_ivf_ignore_self_exclusion():
    """Sharded search drops the query's own doc ids (reference self-
    exclusion protocol, sotasum/mips.py:388-400) and matches the
    unsharded ignore path."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 simulated devices")
    from retrieval_augmented_mds_tpu.index.ivf import (
        ivf_search_sharded,
        shard_ivf_index,
    )
    from retrieval_augmented_mds_tpu.parallel import MeshSpec

    mesh = MeshSpec(1, 8).build()
    x = _clustered_data(n=4096, d=64, n_true=32, seed=21)
    rng = np.random.default_rng(22)
    own = rng.integers(0, len(x), 8).astype(np.int32)
    q = x[own]  # exact rows: without ignore, rank-1 hit is the row itself
    ignore = np.stack([own, np.full_like(own, -1)], axis=1)  # [B, 2]

    idx = build_ivf_index(x, n_clusters=32, dtype=jnp.float32, seed=6)
    v_ref, i_ref = ivf_search(
        idx, jnp.asarray(q), k=10, nprobe=8, ignore=jnp.asarray(ignore)
    )
    sharded = shard_ivf_index(idx, mesh)
    v_s, i_s = ivf_search_sharded(
        sharded, jnp.asarray(q), mesh, k=10, nprobe=8,
        ignore=jnp.asarray(ignore),
    )
    got = np.asarray(i_s)
    assert not np.any(got == own[:, None]), "own doc id leaked into results"
    assert np.array_equal(
        np.sort(np.asarray(i_ref), -1), np.sort(got, -1)
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(v_ref), -1), np.sort(np.asarray(v_s), -1),
        rtol=1e-5,
    )


def test_scan_all_route_is_exact():
    """When B*nprobe >= C the search routes to a direct scan of the
    clustered layout (no union gather) — results must equal brute-force
    exact search, including overflow rows in the spill buffer."""
    x = _clustered_data(n=1024, d=32, n_true=2, seed=30)  # heavy spill
    rng = np.random.default_rng(31)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32, alpha=1.0)
    assert int(np.asarray(idx.spill_ids >= 0).sum()) > 0  # spill engaged

    ref = np.argsort(-(q @ x.T), -1)[:, :7]
    _, ids = ivf_search(idx, jnp.asarray(q), k=7, nprobe=8)  # 128 >= 8
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(ref, -1))


def test_scan_all_route_honors_ignore():
    x = _clustered_data(n=512, d=32, seed=32)
    q = x[:6]
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32)
    ignore = jnp.asarray(np.arange(6, dtype=np.int32)[:, None])
    _, ids = ivf_search(idx, jnp.asarray(q), k=5, nprobe=8, ignore=ignore)
    ids = np.asarray(ids)
    for r in range(6):
        assert r not in set(ids[r])


def test_flat_sibling_route_matches_clustered_scan():
    """Round-3 training-shape route: with the flat sibling payload the
    scan-all search delegates to the flat kernel; results must equal the
    clustered-layout direct scan (both exact) on the same build."""
    x = _clustered_data(n=1024, d=32, seed=40)
    rng = np.random.default_rng(41)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    with_flat = build_ivf_index(x, n_clusters=8, dtype=jnp.float32,
                                seed=3, keep_flat=True)
    no_flat = build_ivf_index(x, n_clusters=8, dtype=jnp.float32,
                              seed=3, keep_flat=False)
    assert with_flat.flat is not None and no_flat.flat is None
    vf, idf = ivf_search(with_flat, jnp.asarray(q), k=7, nprobe=8)
    vc, idc = ivf_search(no_flat, jnp.asarray(q), k=7, nprobe=8)
    assert np.array_equal(np.sort(np.asarray(idf), -1),
                          np.sort(np.asarray(idc), -1))
    np.testing.assert_allclose(np.sort(np.asarray(vf), -1),
                               np.sort(np.asarray(vc), -1), rtol=1e-5)


def test_flat_sibling_route_honors_ignore():
    x = _clustered_data(n=512, d=32, seed=42)
    q = x[:6]
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32, keep_flat=True)
    assert idx.flat is not None
    ignore = jnp.asarray(np.arange(6, dtype=np.int32)[:, None])
    _, ids = ivf_search(idx, jnp.asarray(q), k=5, nprobe=8, ignore=ignore)
    ids = np.asarray(ids)
    for r in range(6):
        assert r not in set(ids[r])


def test_empty_spill_skipped_and_exact():
    """alpha high enough that no cluster overflows → n_spill == 0; the
    spill scan is skipped on both routes and results stay exact."""
    x = _clustered_data(n=1024, d=32, seed=43)
    rng = np.random.default_rng(44)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=4, dtype=jnp.float32, alpha=4.0,
                          keep_flat=False)
    assert idx.n_spill == 0
    ref = np.argsort(-(q @ x.T), -1)[:, :5]
    _, ids = ivf_search(idx, jnp.asarray(q), k=5, nprobe=4)  # scan-all
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(ref, -1))
    # union-probe route (B*nprobe < C impossible at C=4; rebuild larger)
    idx2 = build_ivf_index(x, n_clusters=64, dtype=jnp.float32, alpha=4.0,
                           keep_flat=False)
    if idx2.n_spill == 0:
        _, ids2 = ivf_search(idx2, jnp.asarray(q)[:2], k=5, nprobe=8)
        assert np.asarray(ids2).shape == (2, 5)


def test_serving_route_b1_matches_composite():
    """`ivf_search(serving=True)` routes through the per-query DMA kernel
    (the default on a real TPU); at B=1 the batch's probe union IS the
    query's own probes, so kernel and composite results must match
    exactly."""
    x = _clustered_data(n=2048, d=64, n_true=16, seed=50)
    rng = np.random.default_rng(51)
    q = x[rng.integers(0, len(x), 1)] + 0.05 * rng.standard_normal(
        (1, 64)
    ).astype(np.float32)
    idx = build_ivf_index(x, n_clusters=16, dtype=jnp.float32, seed=7,
                          keep_flat=False)

    v_ref, i_ref = ivf_search(idx, jnp.asarray(q), k=5, nprobe=4,
                              serving=False)
    v_k, i_k = ivf_search(idx, jnp.asarray(q), k=5, nprobe=4, serving=True)
    assert np.array_equal(np.asarray(i_ref), np.asarray(i_k))
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_k), rtol=1e-5)


def test_serving_route_honors_ignore():
    """Self-exclusion flows through the serving-kernel route: own doc ids
    never appear, and B=1 results equal the composite's ignore path."""
    x = _clustered_data(n=1024, d=32, seed=52)
    idx = build_ivf_index(x, n_clusters=16, dtype=jnp.float32, seed=8,
                          keep_flat=False)
    for r in range(3):
        q = jnp.asarray(x[r : r + 1])
        ignore = jnp.asarray(np.asarray([[r]], dtype=np.int32))
        _, ids = ivf_search(idx, q, k=5, nprobe=4, ignore=ignore,
                            serving=True)
        assert r not in set(np.asarray(ids)[0])
    q = jnp.asarray(x[:1])
    ignore = jnp.asarray(np.asarray([[0]], dtype=np.int32))
    _, i_ref = ivf_search(idx, q, k=5, nprobe=4, ignore=ignore,
                          serving=False)
    _, i_k = ivf_search(idx, q, k=5, nprobe=4, ignore=ignore, serving=True)
    assert np.array_equal(np.asarray(i_ref), np.asarray(i_k))


def test_ivf_save_load_preserves_flat_and_nspill(tmp_path):
    from retrieval_augmented_mds_tpu.index.ivf import (
        load_ivf_index,
        save_ivf_index,
    )

    x = _clustered_data(n=512, d=32, seed=45)
    idx = build_ivf_index(x, n_clusters=8, dtype=jnp.float32, keep_flat=True)
    save_ivf_index(idx, str(tmp_path / "ivf"))
    back = load_ivf_index(str(tmp_path / "ivf"))
    assert back.n_spill == idx.n_spill
    assert back.flat is not None
    q = jnp.asarray(x[:4])
    v0, i0 = ivf_search(idx, q, k=5, nprobe=8)
    v1, i1 = ivf_search(back, q, k=5, nprobe=8)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
