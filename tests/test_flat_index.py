"""Sharded flat index: parity with brute force on a simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.index import (
    augment_corpus,
    augment_queries,
    build_flat_index,
    search,
)
from retrieval_augmented_mds_tpu.index.flat import (
    load_flat_index,
    save_flat_index,
)
from retrieval_augmented_mds_tpu.parallel import MeshSpec


def _data(n=3000, d=64, b=6, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((n, d)).astype(np.float32),
        rng.standard_normal((b, d)).astype(np.float32),
    )


def _brute_ip(q, e, k):
    s = q @ e.T
    return np.argsort(-s, axis=-1)[:, :k]


def test_single_device_ip():
    e, q = _data()
    idx = build_flat_index(e, dtype=jnp.float32)
    _, ids = search(idx, jnp.asarray(q), k=10)
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(_brute_ip(q, e, 10), -1))


def test_normalized_ip_is_cosine():
    e, q = _data(seed=1)
    idx = build_flat_index(e, normalize=True, dtype=jnp.float32)
    _, ids = search(idx, jnp.asarray(q), k=5)
    en = e / np.linalg.norm(e, axis=-1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(_brute_ip(qn, en, 5), -1))


def test_l2_metric():
    e, q = _data(seed=2)
    idx = build_flat_index(e, metric="l2", dtype=jnp.float32)
    _, ids = search(idx, jnp.asarray(q), k=5)
    d2 = ((q[:, None] - e[None]) ** 2).sum(-1)
    ref = np.argsort(d2, -1)[:, :5]
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(ref, -1))


@pytest.mark.parametrize("data_ax,shard_ax", [(1, 8), (2, 4)])
def test_sharded_search_matches_brute(data_ax, shard_ax):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = MeshSpec(data_ax, shard_ax).build()
    e, q = _data(n=5000, d=96, b=8, seed=3)
    idx = build_flat_index(e, mesh=mesh, dtype=jnp.float32, row_align=512)
    _, ids = search(idx, jnp.asarray(q), k=10, mesh=mesh)
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(_brute_ip(q, e, 10), -1))


def test_sharded_search_data_parallel_queries():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = MeshSpec(2, 4).build()
    e, q = _data(n=4000, d=64, b=8, seed=4)
    idx = build_flat_index(e, mesh=mesh, dtype=jnp.float32, row_align=512)
    _, ids = search(idx, jnp.asarray(q), k=7, mesh=mesh, data_sharded=True)
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(_brute_ip(q, e, 7), -1))


def test_self_exclusion():
    e, q = _data(seed=5)
    idx = build_flat_index(e, dtype=jnp.float32)
    ref = _brute_ip(q, e, 3)
    ignore = jnp.asarray(ref[:, :2].astype(np.int32))  # exclude true top-2
    _, ids = search(idx, jnp.asarray(q), k=3, ignore=ignore)
    ids = np.asarray(ids)
    for r in range(q.shape[0]):
        assert not (set(ids[r]) & set(ref[r, :2]))


def test_phi_augmentation_l2_equals_ip():
    """The reference's only surviving numerical check (sotasum/mips.py:655-686):
    L2 search over the φ-augmented corpus == IP search over the original."""
    e, q = _data(n=2000, d=48, seed=6)
    ref = _brute_ip(q, e, 10)

    ea, phi = augment_corpus(jnp.asarray(e))
    qa = augment_queries(jnp.asarray(q))
    idx = build_flat_index(np.asarray(ea), metric="l2", dtype=jnp.float32)
    _, ids = search(idx, qa, k=10)
    assert np.array_equal(np.sort(np.asarray(ids), -1), np.sort(ref, -1))


def test_save_load_roundtrip(tmp_path):
    e, q = _data(seed=7)
    idx = build_flat_index(e, metric="l2", dtype=jnp.float32)
    save_flat_index(idx, str(tmp_path / "idx"))
    idx2 = load_flat_index(str(tmp_path / "idx"))
    v1, i1 = search(idx, jnp.asarray(q), k=5)
    v2, i2 = search(idx2, jnp.asarray(q), k=5)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_sq8_int8_payload_high_recall():
    """FAISS SQ8 analog: int8 corpus + per-row dequant scales."""
    e, q = _data(n=4000, d=96, b=8, seed=8)
    idx8 = build_flat_index(e, dtype="int8")
    assert idx8.embeddings.dtype == jnp.int8 and idx8.row_scale is not None
    _, ids8 = search(idx8, jnp.asarray(q), k=10)
    ref = _brute_ip(q, e, 10)
    hits = sum(
        len(set(np.asarray(ids8)[i]) & set(ref[i])) for i in range(len(q))
    )
    assert hits / (len(q) * 10) >= 0.9  # 8-bit rounding flips only near-ties


def test_sq8_sharded_and_roundtrip(tmp_path):
    mesh = None
    if len(jax.devices()) >= 8:
        from retrieval_augmented_mds_tpu.parallel import MeshSpec

        mesh = MeshSpec(1, 8).build()
    e, q = _data(n=3000, d=64, b=4, seed=9)
    idx8 = build_flat_index(e, dtype="int8", mesh=mesh, row_align=512)
    v1, i1 = search(idx8, jnp.asarray(q), k=5, mesh=mesh)
    save_flat_index(idx8, str(tmp_path / "sq8"))
    idx2 = load_flat_index(str(tmp_path / "sq8"))
    v2, i2 = search(idx2, jnp.asarray(q), k=5)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
