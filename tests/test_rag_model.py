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
