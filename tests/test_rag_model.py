"""End-to-end RAG model: shapes, probability mass, gradient structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.index import build_flat_index
from retrieval_augmented_mds_tpu.models.led import shift_tokens_right
from retrieval_augmented_mds_tpu.models.retriever_generator import (
    MemoryStore,
    RAGConfig,
    init_rag,
    rag_forward,
)

B, S, LQ, LM, T, N = 2, 128, 64, 64, 8, 64


def _store(cfg, seed=0):
    rng = np.random.default_rng(seed)
    h = cfg.query_enc.d_model
    emb = rng.standard_normal((N, h)).astype(np.float32)
    index = build_flat_index(emb, dtype=jnp.float32, row_align=64)
    ids = rng.integers(4, cfg.mips_enc.vocab_size, (N, LM)).astype(np.int32)
    ids[:, 0] = cfg.mips_enc.bos_id
    mask = np.ones((N, LM), np.int32)
    return MemoryStore(
        index=index,
        token_ids=jnp.asarray(ids),
        token_mask=jnp.asarray(mask),
        row_aids=None,
    )


def _batch(cfg, seed=1):
    rng = np.random.default_rng(seed)
    v = cfg.led.vocab_size
    input_ids = rng.integers(4, v - 2, (B, S)).astype(np.int32)
    input_ids[:, 0] = cfg.led.bos_id
    input_ids[:, 40] = cfg.led.doc_sep_id
    labels = rng.integers(4, v - 2, (B, T)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "query_input_ids": jnp.asarray(
            rng.integers(4, cfg.query_enc.vocab_size, (B, LQ)).astype(np.int32)
        ),
        "query_attention_mask": jnp.ones((B, LQ), jnp.int32),
        "labels": jnp.asarray(labels),
        "decoder_input_ids": shift_tokens_right(
            jnp.asarray(labels), cfg.led.pad_id, cfg.led.bos_id
        ),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(0), cfg)
    return cfg, params, _store(cfg), _batch(cfg)


def test_forward_shapes_and_mass(setup):
    cfg, params, store, batch = setup
    out, aux, enc_out = rag_forward(params, cfg, store, batch)
    v = cfg.led.vocab_size
    m = cfg.mips_topk * LM
    assert out.shape == (B, T, v)
    assert aux["copy_gate"].shape == (B, T, 1)
    assert aux["copy_probs"].shape == (B, T, m)
    assert enc_out.mips_scores.shape == (B, cfg.mips_topk)
    assert enc_out.retrieved_idx.shape == (B, cfg.mips_topk)
    # out is log of a proper mixture → probabilities sum to ~1
    mass = np.asarray(jnp.exp(out).sum(-1))
    np.testing.assert_allclose(mass, 1.0, rtol=3e-3)
    # scores are cosines
    assert np.all(np.abs(np.asarray(enc_out.mips_scores)) <= 1.001)


def test_copy_token_decoder_head(setup):
    cfg0, _, store, batch = setup
    cfg = RAGConfig.tiny(use_own_decoder=False)
    params = init_rag(jax.random.PRNGKey(1), cfg)
    out, aux, _ = rag_forward(params, cfg, store, batch)
    mass = np.asarray(jnp.exp(out).sum(-1))
    np.testing.assert_allclose(mass, 1.0, rtol=3e-3)


def test_mips_disabled_plain_seq2seq(setup):
    _, _, _, batch = setup
    cfg = RAGConfig.tiny(mips_disabled=True)
    params = init_rag(jax.random.PRNGKey(2), cfg)
    out, aux, enc_out = rag_forward(params, cfg, None, batch)
    assert out.shape == (B, T, cfg.led.vocab_size)
    assert enc_out.memory is None and aux == {}


@pytest.mark.slow
def test_gradients_reach_retriever_only_via_rescoring(setup):
    cfg, params, store, batch = setup

    def loss_fn(p):
        out, _, _ = rag_forward(p, cfg, store, batch)
        tgt = batch["labels"]
        ll = jnp.take_along_axis(out, tgt[..., None], axis=-1)
        return -jnp.mean(ll)

    grads = jax.grad(loss_fn)(params)
    qg = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["query_encoder"], 0.0
    )
    mg = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["mips_encoder"], 0.0
    )
    assert qg > 0  # retriever gets signal through the differentiable rescore
    assert mg > 0
    assert np.isfinite(qg) and np.isfinite(mg)


def test_target_in_forcing_adds_slot(setup):
    cfg0, _, store, batch = setup
    cfg = RAGConfig.tiny(memory_forcing="target_in", copy_forcing=1.0)
    params = init_rag(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(5)
    batch = dict(batch)
    batch["target_memory_ids"] = jnp.asarray(
        rng.integers(4, cfg.memory_enc.vocab_size, (B, LM)).astype(np.int32)
    )
    batch["target_memory_mask"] = jnp.ones((B, LM), jnp.int32)
    out, aux, enc_out = rag_forward(
        params, cfg, store, batch, copy_force=jnp.asarray(True)
    )
    assert enc_out.mips_scores.shape == (B, cfg.mips_topk + 1)
    assert aux["copy_probs"].shape == (B, T, (cfg.mips_topk + 1) * LM)


def test_self_exclusion_respected(setup):
    cfg, params, store, batch = setup
    _, _, enc0 = rag_forward(params, cfg, store, batch)
    first = np.asarray(enc0.retrieved_idx)[:, :1]
    batch2 = dict(batch)
    batch2["mips_ignore"] = jnp.asarray(first.astype(np.int32))
    _, _, enc1 = rag_forward(params, cfg, store, batch2)
    got = np.asarray(enc1.retrieved_idx)
    for b in range(B):
        assert first[b, 0] not in set(got[b])


def test_rag_with_ivf_index():
    """End-to-end RAG forward with the IVF (coarse-quantized) index."""
    from retrieval_augmented_mds_tpu.index.ivf import build_ivf_index

    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    h = cfg.query_enc.d_model
    emb = rng.standard_normal((N, h)).astype(np.float32)
    ivf = build_ivf_index(emb, n_clusters=8, dtype=jnp.float32)
    ids = rng.integers(4, cfg.mips_enc.vocab_size, (N, LM)).astype(np.int32)
    store = MemoryStore(
        index=ivf,
        token_ids=jnp.asarray(ids),
        token_mask=jnp.ones((N, LM), jnp.int32),
        row_aids=None,
        nprobe=4,
    )
    batch = _batch(cfg)
    out, aux, enc_out = rag_forward(params, cfg, store, batch)
    assert out.shape[0] == B
    assert enc_out.retrieved_idx.shape == (B, cfg.mips_topk)
    assert int(enc_out.retrieved_idx.max()) < N


def test_memory_model_fixed_shares_mips_encoder(setup):
    """memory_model_fixed=True (default): no memory_encoder param group;
    the copy-attention memory IS the rescoring encoder's hidden states —
    one re-encode instead of the reference's two (sotasum/mips.py:465-496)."""
    cfg, params, store, batch = setup
    assert cfg.memory_model_fixed
    assert "memory_encoder" not in params
    _, _, enc_out = rag_forward(params, cfg, store, batch)
    # memory hidden states come from the mips encoder over retrieved rows
    from retrieval_augmented_mds_tpu.models.longformer import (
        longformer_encode,
    )

    idx = np.asarray(enc_out.retrieved_idx)
    ids = np.asarray(store.token_ids)[idx.reshape(-1)]
    mask = np.asarray(store.token_mask)[idx.reshape(-1)]
    want = np.asarray(
        longformer_encode(
            params["mips_encoder"], cfg.mips_enc, jnp.asarray(ids),
            jnp.asarray(mask),
        )
    ).reshape(B, cfg.mips_topk * LM, -1)
    np.testing.assert_allclose(
        np.asarray(enc_out.memory), want, rtol=1e-5, atol=1e-5
    )


def test_memory_model_fixed_false_uses_separate_encoder(setup):
    cfg0, _, store, batch = setup
    cfg = RAGConfig.tiny(memory_model_fixed=False)
    params = init_rag(jax.random.PRNGKey(11), cfg)
    assert "memory_encoder" in params
    out, aux, enc_out = rag_forward(params, cfg, store, batch)
    mass = np.asarray(jnp.exp(out).sum(-1))
    np.testing.assert_allclose(mass, 1.0, rtol=3e-3)
    assert "memory_encoder" in cfg.frozen_groups() or not cfg.mips_freezed


def test_memory_model_fixed_config_validation():
    from retrieval_augmented_mds_tpu.models.config import EncoderConfig

    with pytest.raises(ValueError, match="memory_encoder_weights"):
        RAGConfig.tiny(memory_encoder_weights="allenai/longformer-base-4096")
    enc2 = EncoderConfig.tiny(d_model=48)
    with pytest.raises(ValueError, match="must match"):
        RAGConfig.tiny(memory_enc=enc2)
    with pytest.raises(ValueError, match="memory_forcing"):
        RAGConfig.tiny(memory_forcing="bogus_mode")


def test_retrieved_forcing_disables_self_exclusion(setup):
    """retrieved_forcing: the query's own articles MAY be retrieved —
    mips_ignore is dropped (reference passes indices=None,
    sotasum/lightning_model.py:202)."""
    cfg0, params, store, batch = setup
    # establish the unconstrained top-1 per query
    _, _, enc0 = rag_forward(params, cfg0, store, batch)
    first = np.asarray(enc0.retrieved_idx)[:, :1].astype(np.int32)
    batch2 = dict(batch)
    batch2["mips_ignore"] = jnp.asarray(first)
    # no_forcing honors the exclusion ...
    _, _, enc1 = rag_forward(params, cfg0, store, batch2)
    for b in range(B):
        assert first[b, 0] not in set(np.asarray(enc1.retrieved_idx)[b])
    # ... retrieved_forcing ignores it: retrieval matches the
    # unconstrained result exactly
    cfg = RAGConfig.tiny(memory_forcing="retrieved_forcing")
    _, _, enc2 = rag_forward(params, cfg, store, batch2)
    np.testing.assert_array_equal(
        np.asarray(enc2.retrieved_idx), np.asarray(enc0.retrieved_idx)
    )
