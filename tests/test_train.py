"""Training loop: loss goes down, freezing works, index refresh swaps."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.models.retriever_generator import (
    RAGConfig,
    init_rag,
)
from retrieval_augmented_mds_tpu.retriever.contrastive import (
    RetrieverConfig,
    init_retriever,
)
from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
from retrieval_augmented_mds_tpu.train.trainer import (
    TrainHyper,
    TrainState,
    make_retriever_train_step,
    make_train_step,
    refresh_store,
)

from tests.test_rag_model import _batch, _store


def test_rag_train_step_decreases_loss():
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(0), cfg)
    store = _store(cfg)
    batch = _batch(cfg)
    hyper = TrainHyper(lr=3e-3, warmup_steps=1, total_steps=100)
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps,
                         grad_clip=hyper.grad_clip)
    state = TrainState.create(params, tx)
    step = make_train_step(cfg, tx, hyper)

    losses = []
    for _ in range(5):
        state, metrics = step(state, store, batch, None)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(metrics["copy_gate_mean"]) <= 1.0
    assert np.isfinite(float(metrics["grad_norm"]))


def test_remat_modes_preserve_the_step():
    """remat is value-preserving: False / True (full) / a
    jax.checkpoint_policies name all produce the same loss and the same
    updated params (it only changes what is recomputed in backward)."""
    cfg = RAGConfig.tiny()
    store = _store(cfg)
    batch = _batch(cfg)

    results = {}
    for remat in (False, True, "dots_with_no_batch_dims_saveable"):
        # re-init per mode: the train step donates `state`, deleting the
        # param buffers it was created from
        params = init_rag(jax.random.PRNGKey(3), cfg)
        hyper = TrainHyper(lr=3e-3, warmup_steps=1, total_steps=100,
                           remat=remat)
        tx = build_optimizer(hyper.lr, hyper.warmup_steps,
                             hyper.total_steps, grad_clip=hyper.grad_clip)
        state = TrainState.create(params, tx)
        step = make_train_step(cfg, tx, hyper)
        state, metrics = step(state, store, batch, None)
        results[remat] = (
            float(metrics["loss"]),
            np.asarray(jax.tree_util.tree_leaves(state.params["led"])[0]),
        )
    base_loss, base_leaf = results[False]
    for remat in (True, "dots_with_no_batch_dims_saveable"):
        loss, leaf = results[remat]
        assert abs(loss - base_loss) < 1e-5, (remat, loss, base_loss)
        np.testing.assert_allclose(leaf, base_leaf, rtol=1e-5, atol=1e-6,
                                   err_msg=str(remat))


def test_freeze_groups_hold_params_fixed():
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(1), cfg)
    store = _store(cfg)
    batch = _batch(cfg)
    hyper = TrainHyper(lr=1e-2, warmup_steps=1, total_steps=100)
    tx = build_optimizer(
        hyper.lr, hyper.warmup_steps, hyper.total_steps,
        frozen_groups=("query_encoder", "mips_encoder"), params=params,
    )
    state = TrainState.create(params, tx)
    step = make_train_step(cfg, tx, hyper)
    before_q = np.asarray(
        jax.tree_util.tree_leaves(params["query_encoder"])[0]
    ).copy()
    before_led = np.asarray(jax.tree_util.tree_leaves(params["led"])[0]).copy()
    for _ in range(2):  # step 0 runs at lr=0 (linear warmup from zero)
        state, _ = step(state, store, batch, None)
    after_q = jax.tree_util.tree_leaves(state.params["query_encoder"])[0]
    after_led = jax.tree_util.tree_leaves(state.params["led"])[0]
    assert np.array_equal(np.asarray(before_q), np.asarray(after_q))
    assert not np.array_equal(np.asarray(before_led), np.asarray(after_led))


def test_retriever_contrastive_learns():
    cfg = RetrieverConfig.tiny(temperature=0.1)
    params = init_retriever(jax.random.PRNGKey(2), cfg)
    tx = build_optimizer(1e-3, 1, 1000)
    state = TrainState.create(params, tx)
    step = make_retriever_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    b, L = 8, 64
    ids = rng.integers(4, cfg.query_enc.vocab_size, (b, L)).astype(np.int32)
    batch = {
        "query_input_ids": jnp.asarray(ids),
        "query_attention_mask": jnp.ones((b, L), jnp.int32),
        "mips_input_ids": jnp.asarray(ids),  # positives = same text
        "mips_attention_mask": jnp.ones((b, L), jnp.int32),
    }
    accs = []
    for _ in range(8):
        state, m = step(state, batch)
        accs.append(float(m["train_accuracy"]))
    assert accs[-1] >= accs[0]
    assert np.isfinite(float(m["loss"]))


def test_refresh_store_rebuilds_index():
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(3), cfg)
    store = _store(cfg)
    new = refresh_store(params, cfg, store, batch_size=16)
    assert new.index.n == store.index.n
    # embeddings now come from the live encoder, not the random init store
    assert not np.allclose(
        np.asarray(new.index.embeddings[: new.index.n]),
        np.asarray(store.index.embeddings[: store.index.n]),
    )
    # and the store's token payload is untouched (double buffer swap)
    assert new.token_ids is store.token_ids


def test_double_buffered_refresh_semantics():
    """Old store stays searchable while/after the new one is built — the
    stale-tolerance contract of the reference's rebuild protocol
    (sotasum/lightning_model.py:148-162) in functional form."""
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(9), cfg)
    store_old = _store(cfg)
    batch = _batch(cfg)

    from retrieval_augmented_mds_tpu.models.retriever_generator import rag_encode

    enc_before = rag_encode(params, cfg, store_old, batch)
    store_new = refresh_store(params, cfg, store_old, batch_size=16)
    # old buffer untouched and still valid
    enc_after = rag_encode(params, cfg, store_old, batch)
    assert np.array_equal(
        np.asarray(enc_before.retrieved_idx), np.asarray(enc_after.retrieved_idx)
    )
    # new buffer usable immediately (pointer swap)
    enc_new = rag_encode(params, cfg, store_new, batch)
    assert enc_new.retrieved_idx.shape == enc_before.retrieved_idx.shape


def test_grad_group_norms_logged():
    """grad_group_norms adds one finite `grad_norm_<group>` per top-level
    param group (GradientsPrintingCallback analog,
    sotasum/lightning_model.py:31-36) and their squares sum to the global
    norm's square."""
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(0), cfg)
    store = _store(cfg)
    batch = _batch(cfg)
    hyper = TrainHyper(lr=3e-3, warmup_steps=1, total_steps=100,
                       grad_group_norms=True)
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps)
    state = TrainState.create(params, tx)
    step = make_train_step(cfg, tx, hyper)
    _, metrics = step(state, store, batch, None)

    groups = {k for k in metrics if k.startswith("grad_norm_")}
    assert {f"grad_norm_{g}" for g in params} == groups
    sq = sum(float(metrics[k]) ** 2 for k in groups)
    np.testing.assert_allclose(
        sq, float(metrics["grad_norm"]) ** 2, rtol=1e-4
    )
