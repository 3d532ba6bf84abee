"""HF weight import parity: our models vs torch LED/Longformer.

Builds tiny HF models locally from config (no downloads), imports their
state_dicts, and compares forward outputs — validating both the mapping
and the architecture semantics (sliding window + global attention, post-LN
blocks, tied LM head) against the stacks the reference uses.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from retrieval_augmented_mds_tpu.models.config import (  # noqa: E402
    EncoderConfig,
    Seq2SeqConfig,
)
from retrieval_augmented_mds_tpu.models.hf_import import (  # noqa: E402
    led_params_from_hf,
    longformer_params_from_hf,
)
from retrieval_augmented_mds_tpu.models.led import (  # noqa: E402
    led_decode,
    led_encode,
    led_lm_logits,
)
from retrieval_augmented_mds_tpu.models.longformer import (  # noqa: E402
    longformer_encode,
)

W = 32  # one-sided window
T = 4 * W


def _led_pair():
    from transformers import LEDConfig, LEDForConditionalGeneration

    hf_cfg = LEDConfig(
        vocab_size=256,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_encoder_position_embeddings=T,
        max_decoder_position_embeddings=64,
        attention_window=[2 * W] * 2,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        decoder_start_token_id=2,
    )
    torch.manual_seed(0)
    hf = LEDForConditionalGeneration(hf_cfg).eval()
    cfg = Seq2SeqConfig(
        vocab_size=256, d_model=32, n_heads=2, enc_layers=2, dec_layers=2,
        d_ffn=64, max_src_len=T, max_tgt_len=64, window=W, max_globals=8,
        doc_sep_id=255,
    )
    params = led_params_from_hf(hf.state_dict(), cfg)
    return hf, cfg, params


def test_led_encoder_parity():
    hf, cfg, params = _led_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 250, (2, T)).astype(np.int64)
    am = np.ones((2, T), np.int64)
    gm = np.zeros((2, T), np.int64)
    gm[:, 0] = 1

    with torch.no_grad():
        hf_out = hf.led.encoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
            global_attention_mask=torch.tensor(gm),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        led_encode(
            params, cfg, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(am.astype(np.int32)),
            jnp.asarray(gm.astype(np.int32)),
        )
    )
    np.testing.assert_allclose(ours, hf_out, rtol=2e-3, atol=2e-3)


def test_led_full_forward_parity():
    hf, cfg, params = _led_pair()
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 250, (2, T)).astype(np.int64)
    am = np.ones((2, T), np.int64)
    dec = rng.integers(4, 250, (2, 10)).astype(np.int64)
    gm = np.zeros((2, T), np.int64)
    gm[:, 0] = 1

    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
            global_attention_mask=torch.tensor(gm),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    enc = led_encode(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(am.astype(np.int32)), jnp.asarray(gm.astype(np.int32)),
    )
    hid, _ = led_decode(
        params, cfg, jnp.asarray(dec.astype(np.int32)), enc,
        jnp.asarray(am.astype(np.int32)),
    )
    ours = np.asarray(led_lm_logits(params, hid))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_longformer_parity():
    from transformers import LongformerConfig, LongformerModel

    hf_cfg = LongformerConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=T + 2,
        attention_window=[2 * W] * 2,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
    )
    torch.manual_seed(1)
    hf = LongformerModel(hf_cfg).eval()
    cfg = EncoderConfig(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=T, window=W, max_globals=8, pos_offset=2,
    )
    params = longformer_params_from_hf(hf.state_dict(), cfg, prefix="")

    rng = np.random.default_rng(2)
    ids = rng.integers(4, 250, (2, T)).astype(np.int64)
    am = np.ones((2, T), np.int64)
    gm = np.zeros((2, T), np.int64)
    gm[:, 0] = 1

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
            global_attention_mask=torch.tensor(gm),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        longformer_encode(
            params, cfg, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(am.astype(np.int32)),
            jnp.asarray(gm.astype(np.int32)),
        )
    )
    np.testing.assert_allclose(ours, hf_out, rtol=2e-3, atol=2e-3)
