"""Multi-chip contracts: the driver's dry run executed as a test."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_sharding_specs_cover_state():
    from retrieval_augmented_mds_tpu.parallel import (
        MeshSpec,
        zero_sharding_for_tree,
    )
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = MeshSpec(4, 2).build()
    tree = {
        "w": jax.numpy.zeros((16, 8)),
        "b": jax.numpy.zeros((3,)),  # not divisible by 4 → replicated
    }
    specs = zero_sharding_for_tree(tree, mesh)
    assert specs["w"].spec == P("data", None)
    assert specs["b"].spec == P()


def test_data_parallel_loss_matches_single_device():
    """DP invariance: the sharded train step computes the same loss as the
    unsharded one on the same global batch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        RAGConfig,
        init_rag,
    )
    from retrieval_augmented_mds_tpu.parallel import MeshSpec
    from retrieval_augmented_mds_tpu.parallel.mesh import DATA_AXIS
    from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
    from retrieval_augmented_mds_tpu.train.trainer import (
        TrainHyper,
        TrainState,
        make_train_step,
    )
    from tests.test_rag_model import _batch, _store

    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(0), cfg)
    store = _store(cfg)
    b1 = _batch(cfg)
    # widen batch to 4 rows so it shards over data=4
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in b1.items()}

    hyper = TrainHyper(lr=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps)

    mesh = MeshSpec(4, 2).build()
    from retrieval_augmented_mds_tpu.index import build_flat_index

    emb = np.asarray(store.index.embeddings[: store.index.n].astype(jnp.float32))
    store_sharded = store.__class__(
        index=build_flat_index(emb, dtype=jnp.float32, mesh=mesh,
                               row_align=64),
        token_ids=store.token_ids,
        token_mask=store.token_mask,
        row_aids=None,
    )
    sharded_batch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P(DATA_AXIS, *[None] * (v.ndim - 1)))
        )
        for k, v in batch.items()
    }
    # device_put copies before step1 donates the original params
    params_r = jax.device_put(params, NamedSharding(mesh, P()))

    step1 = make_train_step(cfg, tx, hyper)
    # deep-copy: device_put's replicated view may alias the device-0
    # buffer, which step1's donation would delete
    params1 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    s1 = TrainState.create(params1, tx)
    _, m1 = step1(s1, store, batch, None)

    step2 = make_train_step(cfg, tx, hyper, mesh=mesh)
    s2 = TrainState.create(params_r, tx)
    with mesh:
        _, m2 = step2(s2, store_sharded, sharded_batch, None)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )


def test_data_parallel_loss_matches_single_device_ivf():
    """DP invariance with the flagship IVF store: the sharded train step
    (cluster-partitioned ivf_search_sharded inside rag_encode) computes
    the same loss as the unsharded one (ivf_search) on the same batch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from retrieval_augmented_mds_tpu.index import build_index_from_factory
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        RAGConfig,
        init_rag,
    )
    from retrieval_augmented_mds_tpu.parallel import MeshSpec
    from retrieval_augmented_mds_tpu.parallel.mesh import DATA_AXIS
    from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
    from retrieval_augmented_mds_tpu.train.trainer import (
        TrainHyper,
        TrainState,
        make_train_step,
    )
    from tests.test_rag_model import _batch, _store

    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(0), cfg)
    store = _store(cfg)
    emb = np.asarray(
        store.index.embeddings[: store.index.n].astype(jnp.float32)
    )
    b1 = _batch(cfg)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in b1.items()}

    hyper = TrainHyper(lr=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps)
    mesh = MeshSpec(4, 2).build()

    # same embeddings, IVF factory: unsharded + cluster-partitioned copies
    idx_plain = build_index_from_factory(emb, "IVF8,Flat", dtype=jnp.float32)
    idx_shard = build_index_from_factory(
        emb, "IVF8,Flat", dtype=jnp.float32, mesh=mesh
    )
    mk = lambda idx: store.__class__(  # noqa: E731
        index=idx, token_ids=store.token_ids, token_mask=store.token_mask,
        row_aids=None, nprobe=4,
    )
    sharded_batch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P(DATA_AXIS, *[None] * (v.ndim - 1)))
        )
        for k, v in batch.items()
    }
    params_r = jax.device_put(params, NamedSharding(mesh, P()))

    step1 = make_train_step(cfg, tx, hyper)
    params1 = jax.tree_util.tree_map(
        lambda x: jax.numpy.array(x, copy=True), params
    )
    s1 = TrainState.create(params1, tx)
    _, m1 = step1(s1, mk(idx_plain), batch, None)

    step2 = make_train_step(cfg, tx, hyper, mesh=mesh)
    s2 = TrainState.create(params_r, tx)
    with mesh:
        _, m2 = step2(s2, mk(idx_shard), sharded_batch, None)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )


def test_sharded_generate_matches_unsharded():
    """Round-3 eval-path coverage (VERDICT r2 #9): mesh-sharded decode —
    DP over the data axis, sequence-sharded encode, shard-distributed
    flat search — produces the same beam-search ids as the unsharded
    single-device path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from retrieval_augmented_mds_tpu.index import build_flat_index
    from retrieval_augmented_mds_tpu.models.generate import (
        GenerationOptions,
        generate,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        RAGConfig,
        init_rag,
        rag_encode,
    )
    from retrieval_augmented_mds_tpu.parallel import MeshSpec
    from retrieval_augmented_mds_tpu.parallel.mesh import DATA_AXIS
    from tests.test_rag_model import _batch, _store

    cfg = RAGConfig.tiny()
    cfg_sp = RAGConfig.tiny(sequence_shard=True)
    params = init_rag(jax.random.PRNGKey(0), cfg)
    store = _store(cfg)
    b1 = _batch(cfg)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in b1.items()}
    opts = GenerationOptions(max_new_tokens=6, num_beams=2,
                             no_repeat_ngram_size=3)

    # unsharded reference
    enc0 = rag_encode(params, cfg, store, batch)
    ref = np.asarray(generate(params, cfg, enc0, opts))

    mesh = MeshSpec(4, 2).build()
    emb = np.asarray(
        store.index.embeddings[: store.index.n].astype(jnp.float32)
    )
    store_sharded = store.__class__(
        index=build_flat_index(emb, dtype=jnp.float32, mesh=mesh,
                               row_align=64),
        token_ids=store.token_ids,
        token_mask=store.token_mask,
        row_aids=None,
    )
    sharded_batch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P(DATA_AXIS, *[None] * (v.ndim - 1)))
        )
        for k, v in batch.items()
    }
    params_r = jax.device_put(params, NamedSharding(mesh, P()))

    @jax.jit
    def eval_step(p, s, b):
        enc = rag_encode(p, cfg_sp, s, b, mesh=mesh)
        return generate(p, cfg_sp, enc, opts)

    with mesh:
        got = np.asarray(eval_step(params_r, store_sharded, sharded_batch))
    np.testing.assert_array_equal(got, ref)
