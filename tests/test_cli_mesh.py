"""Production `fit` runs the verified multi-chip composition.

The dryrun (`__graft_entry__.dryrun_multichip`) certifies DP x SP x
sharded-index x ZeRO; these tests drive `run_fit` ITSELF (not
make_train_step) on a mesh and pin loss parity with the single-device
path, plus the persisted-index round trip (`build-index` -> `validate
--index`) that replaces re-embedding the corpus on every eval command
(reference Mips.load, sotasum/mips.py:545-549).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.cli import (
    load_store,
    run_build_index,
    run_fit,
    run_validate,
)
from retrieval_augmented_mds_tpu.utils.config import load_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "smoke.yaml")


def _cfg(tmp_path, **over):
    cfg = load_config(CFG)
    log = dataclasses.replace(cfg.logging, log_dir=str(tmp_path))
    return dataclasses.replace(cfg, logging=log, **over)


def _with_mesh(cfg, data, shard):
    return dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, data=data, shard=shard)
    )


@pytest.mark.slow
def test_run_fit_mesh_matches_single_device(tmp_path):
    """`cli fit` on a 4x2 mesh (params replicated, batch data-sharded,
    index row-sharded, opt state ZeRO-sharded) reaches the same loss as
    the explicit single-device run — the production-path version of
    tests/test_multichip.py's step-level DP invariance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")

    base = _cfg(tmp_path / "a", max_steps=2, eval_every=0, ckpt_dir=None)
    # mesh: {data: 0} -> build_mesh returns None (explicit single-device)
    out_single = run_fit(_with_mesh(base, 0, 0))

    base2 = _cfg(tmp_path / "b", max_steps=2, eval_every=0, ckpt_dir=None)
    out_mesh = run_fit(_with_mesh(base2, 4, 2))

    assert out_mesh["steps"] == out_single["steps"] == 2
    np.testing.assert_allclose(
        out_single["loss"], out_mesh["loss"], rtol=1e-4
    )


@pytest.mark.slow
def test_run_fit_mesh_zero_shards_opt_state(tmp_path):
    """The opt state placed by `run_fit` on a mesh is actually ZeRO-
    sharded: at least one moment leaf's sharding splits the data axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from jax.sharding import PartitionSpec as P

    from retrieval_augmented_mds_tpu.cli import (
        build_data,
        build_mesh,
        build_store,
        build_tx,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        init_rag_pretrained,
    )
    from retrieval_augmented_mds_tpu.parallel import zero_sharding_for_tree
    from retrieval_augmented_mds_tpu.train.trainer import TrainState

    cfg = _with_mesh(_cfg(tmp_path, max_steps=1, eval_every=0), 4, 2)
    mesh = build_mesh(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    tx = build_tx(cfg, params, mesh=mesh)
    state = TrainState.create(params, tx)
    placed = jax.device_put(
        state.opt_state, zero_sharding_for_tree(state.opt_state, mesh)
    )
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(placed)
        if hasattr(leaf, "sharding")
    ]
    assert any("data" in str(s) for s in specs), specs
    assert all(isinstance(s, P) for s in specs)


@pytest.mark.slow
def test_build_index_validate_roundtrip(tmp_path):
    """`build-index` output feeds `validate --index`: the loaded store
    searches identically to a freshly built one (same params/seed), and
    the validate epoch runs without re-embedding."""
    from retrieval_augmented_mds_tpu.cli import build_data, build_store
    from retrieval_augmented_mds_tpu.index import search
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        init_rag_pretrained,
    )

    cfg = _with_mesh(_cfg(tmp_path, max_steps=1, eval_every=0), 0, 0)
    out = run_build_index(cfg, str(tmp_path / "idx"))
    assert out["n"] > 0
    assert os.path.exists(tmp_path / "idx" / "corpus_tokens.npz")

    # the loaded index answers queries identically to a fresh build
    store_loaded = load_store(str(tmp_path / "idx"), cfg)
    dm, _ = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    store_fresh = build_store(params, cfg, dm)
    assert store_loaded.index.n == store_fresh.index.n == out["n"]
    q = np.asarray(
        store_fresh.index.embeddings[:4], dtype=np.float32
    ) + 0.01 * np.random.default_rng(0).standard_normal(
        (4, store_fresh.index.embeddings.shape[1])
    ).astype(np.float32)
    _, i_fresh = search(store_fresh.index, jax.numpy.asarray(q), k=2)
    _, i_loaded = search(store_loaded.index, jax.numpy.asarray(q), k=2)
    np.testing.assert_array_equal(np.asarray(i_fresh), np.asarray(i_loaded))

    metrics = run_validate(cfg, index_dir=str(tmp_path / "idx"))
    assert "rouge1" in metrics
