"""Generation: greedy/beam parity, ngram banning, memory-conditioned decode."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.models.generate import (
    GenerationOptions,
    generate,
)
from retrieval_augmented_mds_tpu.models.retriever_generator import (
    RAGConfig,
    init_rag,
    rag_encode,
)

from tests.test_rag_model import _batch, _store


def _enc(cfg, params, store, batch):
    return rag_encode(params, cfg, store, batch)


def test_greedy_shapes_and_determinism():
    cfg = RAGConfig.tiny(mips_disabled=True)
    params = init_rag(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    enc = _enc(cfg, params, None, batch)
    opts = GenerationOptions(max_new_tokens=10)
    out1 = generate(params, cfg, enc, opts)
    out2 = generate(params, cfg, enc, opts)
    assert out1.shape == (2, 10)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))


def test_beam1_equals_greedy():
    cfg = RAGConfig.tiny(mips_disabled=True)
    params = init_rag(jax.random.PRNGKey(1), cfg)
    batch = _batch(cfg)
    enc = _enc(cfg, params, None, batch)
    g = generate(params, cfg, enc, GenerationOptions(max_new_tokens=8))
    b = generate(
        params, cfg, enc, GenerationOptions(max_new_tokens=8, num_beams=2)
    )
    # beam≥1 must score at least as well as greedy; with a random model the
    # sequences usually coincide for the first steps — check shape + dtype
    assert b.shape == g.shape


def test_no_repeat_ngram():
    cfg = RAGConfig.tiny(mips_disabled=True)
    params = init_rag(jax.random.PRNGKey(2), cfg)
    batch = _batch(cfg)
    enc = _enc(cfg, params, None, batch)
    out = generate(
        params, cfg, enc,
        GenerationOptions(max_new_tokens=16, no_repeat_ngram_size=2,
                          min_length=16),
    )
    ids = np.asarray(out)
    for row in ids:
        bigrams = set()
        for i in range(len(row) - 1):
            bg = (row[i], row[i + 1])
            assert bg not in bigrams, f"repeated bigram {bg}"
            bigrams.add(bg)


def test_memory_conditioned_generation_runs():
    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(3), cfg)
    store = _store(cfg)
    batch = _batch(cfg)
    enc = _enc(cfg, params, store, batch)
    out = generate(
        params, cfg, enc, GenerationOptions(max_new_tokens=6, num_beams=3)
    )
    assert out.shape == (2, 6)
    assert np.asarray(out).dtype == np.int32


def test_copy_trace():
    from retrieval_augmented_mds_tpu.models.generate import copy_trace

    cfg = RAGConfig.tiny()
    params = init_rag(jax.random.PRNGKey(5), cfg)
    store = _store(cfg)
    batch = _batch(cfg)
    enc = rag_encode(params, cfg, store, batch)
    ids = generate(params, cfg, enc, GenerationOptions(max_new_tokens=5))
    tr = copy_trace(params, cfg, enc, ids)
    assert tr["copy_gate"].shape == (2, 5)
    assert tr["top_mem_tok"].shape == (2, 5, 4)
    g = np.asarray(tr["copy_gate"])
    assert (g >= 0).all() and (g <= 1).all()


def test_beam_score_at_least_greedy():
    """Sequence log-prob of the beam-4 output >= greedy output's."""
    cfg = RAGConfig.tiny(mips_disabled=True)
    params = init_rag(jax.random.PRNGKey(11), cfg)
    batch = _batch(cfg)
    enc = rag_encode(params, cfg, None, batch)

    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.models.led import shift_tokens_right
    from retrieval_augmented_mds_tpu.models.retriever_generator import rag_decode

    def seq_logprob(ids):
        dec_in = shift_tokens_right(ids, cfg.led.pad_id, 2)
        out, _, _ = rag_decode(params, cfg, enc, dec_in)
        lp = jax.nn.log_softmax(out, -1)
        tok_lp = jnp.take_along_axis(lp, ids[..., None], -1)[..., 0]
        mask = ids != cfg.led.pad_id
        return np.asarray((tok_lp * mask).sum(-1))

    g = generate(params, cfg, enc, GenerationOptions(max_new_tokens=8,
                                                     min_length=8))
    b = generate(params, cfg, enc,
                 GenerationOptions(max_new_tokens=8, num_beams=4,
                                   min_length=8))
    assert (seq_logprob(b) >= seq_logprob(g) - 1e-3).all()


def test_copy_distribution_diagnostics():
    from retrieval_augmented_mds_tpu.models.copy_decoder import (
        copy_distribution_over_vocab,
    )

    rng = np.random.default_rng(12)
    b, t, m, v = 2, 3, 8, 32
    cp = rng.random((b, t, m)).astype(np.float32)
    cs = rng.integers(0, v, (b, m)).astype(np.int32)
    out = np.asarray(
        copy_distribution_over_vocab(jnp.asarray(cp), jnp.asarray(cs), v)
    )
    np.testing.assert_allclose(out.sum(-1), cp.sum(-1), rtol=1e-5)
