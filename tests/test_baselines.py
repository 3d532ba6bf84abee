"""BART/T5 baselines: HF torch parity + decode cache parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from retrieval_augmented_mds_tpu.models.bart import (  # noqa: E402
    bart_decode,
    bart_encode,
    bart_lm_logits,
    bart_params_from_hf,
    init_bart,
)
from retrieval_augmented_mds_tpu.models.config import Seq2SeqConfig  # noqa: E402
from retrieval_augmented_mds_tpu.models.t5 import (  # noqa: E402
    init_t5,
    t5_decode,
    t5_encode,
    t5_lm_logits,
    t5_params_from_hf,
    t5_shift_right,
)

CFG = Seq2SeqConfig(
    vocab_size=256, d_model=32, n_heads=2, enc_layers=2, dec_layers=2,
    d_ffn=64, max_src_len=64, max_tgt_len=32,
)


def test_bart_parity_with_hf():
    from transformers import BartConfig, BartForConditionalGeneration

    hf_cfg = BartConfig(
        vocab_size=256, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=66,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, forced_eos_token_id=None,
    )
    torch.manual_seed(0)
    hf = BartForConditionalGeneration(hf_cfg).eval()
    params = bart_params_from_hf(hf.state_dict(), CFG)

    rng = np.random.default_rng(0)
    src = rng.integers(4, 250, (2, 20)).astype(np.int64)
    am = np.ones((2, 20), np.int64)
    dec = rng.integers(4, 250, (2, 8)).astype(np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(am),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    enc = bart_encode(params, CFG, jnp.asarray(src.astype(np.int32)),
                      jnp.asarray(am.astype(np.int32)))
    hid, _ = bart_decode(params, CFG, jnp.asarray(dec.astype(np.int32)),
                         enc, jnp.asarray(am.astype(np.int32)))
    ours = np.asarray(bart_lm_logits(params, hid))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_t5_parity_with_hf():
    from transformers import T5Config, T5ForConditionalGeneration

    hf_cfg = T5Config(
        vocab_size=256, d_model=32, num_layers=2, num_decoder_layers=2,
        num_heads=2, d_kv=16, d_ff=64, feed_forward_proj="relu",
        pad_token_id=1, eos_token_id=2, decoder_start_token_id=0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    params = t5_params_from_hf(hf.state_dict(), CFG)

    rng = np.random.default_rng(1)
    src = rng.integers(4, 250, (2, 24)).astype(np.int64)
    am = np.ones((2, 24), np.int64)
    dec = rng.integers(4, 250, (2, 7)).astype(np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(am),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    enc = t5_encode(params, CFG, jnp.asarray(src.astype(np.int32)),
                    jnp.asarray(am.astype(np.int32)))
    hid, _ = t5_decode(params, CFG, jnp.asarray(dec.astype(np.int32)),
                       enc, jnp.asarray(am.astype(np.int32)))
    ours = np.asarray(t5_lm_logits(params, hid, CFG))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_t5_decode_cache_parity():
    params = init_t5(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(2)
    src = rng.integers(4, 250, (2, 16)).astype(np.int32)
    am = np.ones((2, 16), np.int32)
    tgt = rng.integers(4, 250, (2, 6)).astype(np.int32)

    enc = t5_encode(params, CFG, jnp.asarray(src), jnp.asarray(am))
    full, _ = t5_decode(params, CFG, jnp.asarray(tgt), enc, jnp.asarray(am))

    from retrieval_augmented_mds_tpu.models.core import make_cache

    dh = CFG.d_model // CFG.n_heads
    caches = [make_cache(2, CFG.n_heads, dh, 6, jnp.float32)
              for _ in range(CFG.dec_layers)]
    outs = []
    for i in range(6):
        hid, caches = t5_decode(
            params, CFG, jnp.asarray(tgt[:, i : i + 1]), enc,
            jnp.asarray(am), caches=caches,
        )
        outs.append(hid)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=2e-4, atol=2e-4)


def test_t5_shift_right():
    ids = jnp.asarray([[5, 6, 7]])
    out = t5_shift_right(ids, pad_id=1, start_id=0)
    assert out.tolist() == [[0, 5, 6]]
