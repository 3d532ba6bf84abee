"""Pretrained-weight spine: config → loaders → identical logits.

Round-2 closure of the realism gap (VERDICT.md missing #1/#2/#4): the
reference never trains from scratch — LED from `model_name`
(sotasum/retriever_generator.py:250-253), SPECTER2 query/index encoders
(mips.py:108-113), retriever-encoder state-dict injection
(model_config.py:29,62). These tests exercise the whole path with tiny
locally-built HF models (no downloads): save_pretrained → config field →
init_rag_pretrained → parity.
"""

import os
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from retrieval_augmented_mds_tpu.models.config import (  # noqa: E402
    EncoderConfig,
    Seq2SeqConfig,
)
from retrieval_augmented_mds_tpu.models.retriever_generator import (  # noqa: E402
    RAGConfig,
    init_rag_pretrained,
)

W = 32
T = 2 * W


def _tiny_cfg(**kw):
    enc = EncoderConfig.tiny(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=T, window=W, max_globals=8,
    )
    d = dict(
        led=Seq2SeqConfig.tiny(
            vocab_size=256, d_model=32, n_heads=2, enc_layers=2, dec_layers=2,
            d_ffn=64, max_src_len=T, max_tgt_len=64, window=W, max_globals=8,
            doc_sep_id=255,
        ),
        query_enc=enc, mips_enc=enc, memory_enc=enc,
        mips_topk=2, memory_len=T,
    )
    d.update(kw)
    return RAGConfig(**d)


def _save_tiny_led(tmp_path) -> str:
    from transformers import LEDConfig, LEDForConditionalGeneration

    hf_cfg = LEDConfig(
        vocab_size=256, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_encoder_position_embeddings=T,
        max_decoder_position_embeddings=64,
        attention_window=[2 * W] * 2, pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=2,
    )
    torch.manual_seed(7)
    hf = LEDForConditionalGeneration(hf_cfg).eval()
    out = os.path.join(str(tmp_path), "tiny_led")
    hf.save_pretrained(out, safe_serialization=True)
    return out


def test_led_weights_config_field_loads_identical_logits(tmp_path):
    """fit's param init starts from the configured LED checkpoint and the
    loaded stack reproduces the HF forward (the reference `model_name`
    startup, sotasum/model_config.py:23)."""
    from transformers import LEDForConditionalGeneration

    from retrieval_augmented_mds_tpu.models.led import (
        led_decode,
        led_encode,
        led_lm_logits,
    )

    path = _save_tiny_led(tmp_path)
    cfg = _tiny_cfg(led_weights=path, mips_disabled=True)
    params = init_rag_pretrained(jax.random.PRNGKey(0), cfg)

    hf = LEDForConditionalGeneration.from_pretrained(path).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 250, (2, T)).astype(np.int64)
    am = np.ones((2, T), np.int64)
    dec = rng.integers(4, 250, (2, 8)).astype(np.int64)
    gm = np.zeros((2, T), np.int64)
    gm[:, 0] = 1
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            global_attention_mask=torch.tensor(gm),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()
    enc = led_encode(
        params["led"], cfg.led, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(am.astype(np.int32)), jnp.asarray(gm.astype(np.int32)),
    )
    hid, _ = led_decode(
        params["led"], cfg.led, jnp.asarray(dec.astype(np.int32)), enc,
        jnp.asarray(am.astype(np.int32)),
    )
    ours = np.asarray(led_lm_logits(params["led"], hid))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_encoder_state_roundtrip_identical_embeddings(tmp_path):
    """pretrain-retriever export → model.encoder_state_path → the fit-side
    query/mips encoders produce bit-identical CLS embeddings (the
    mips_state_dict/query_state_dict handoff, model_config.py:29,62)."""
    from retrieval_augmented_mds_tpu.models.longformer import (
        longformer_encode,
    )
    from retrieval_augmented_mds_tpu.retriever.contrastive import (
        RetrieverConfig,
        init_retriever,
    )
    from retrieval_augmented_mds_tpu.utils.checkpoint import export_encoders

    cfg = _tiny_cfg()
    rcfg = RetrieverConfig(query_enc=cfg.query_enc, mips_enc=cfg.mips_enc)
    trained = init_retriever(jax.random.PRNGKey(42), rcfg)
    path = os.path.join(str(tmp_path), "encoders.npz")
    export_encoders(path, trained)

    params = init_rag_pretrained(
        jax.random.PRNGKey(0),
        _tiny_cfg(encoder_state_path=path, memory_model_fixed=False),
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(4, 250, (2, T)).astype(np.int32))
    mask = jnp.ones((2, T), jnp.int32)
    for group in ("query_encoder", "mips_encoder"):
        want = np.asarray(
            longformer_encode(trained[group], cfg.query_enc, ids, mask)[:, 0]
        )
        got = np.asarray(
            longformer_encode(params[group], cfg.query_enc, ids, mask)[:, 0]
        )
        np.testing.assert_array_equal(got, want)
    # memory encoder was NOT in the export — stays at the fresh init
    fresh = init_rag_pretrained(
        jax.random.PRNGKey(0), _tiny_cfg(memory_model_fixed=False)
    )
    a = jax.tree_util.tree_leaves(params["memory_encoder"])
    b = jax.tree_util.tree_leaves(fresh["memory_encoder"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_missing_local_state_path_raises():
    with pytest.raises(FileNotFoundError):
        init_rag_pretrained(
            jax.random.PRNGKey(0),
            _tiny_cfg(encoder_state_path="/nonexistent/encoders.npz"),
        )


def test_existing_local_dir_that_fails_to_load_raises(tmp_path):
    bad = os.path.join(str(tmp_path), "not_a_model")
    os.makedirs(bad)
    with pytest.raises(Exception):
        init_rag_pretrained(
            jax.random.PRNGKey(0), _tiny_cfg(led_weights=bad)
        )


@pytest.mark.slow
def test_unfetchable_hub_name_warns_and_keeps_random_init():
    """Zero-egress container: a hub name that can't be fetched must warn
    LOUDLY and keep the random init (graceful skip, not silence)."""
    cfg = _tiny_cfg(led_weights="no-such-org/no-such-model-xyz")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        params = init_rag_pretrained(jax.random.PRNGKey(0), cfg)
    assert any("SKIPPING" in str(x.message) for x in w)
    fresh = init_rag_pretrained(jax.random.PRNGKey(0), _tiny_cfg())
    for x, y in zip(
        jax.tree_util.tree_leaves(params["led"]),
        jax.tree_util.tree_leaves(fresh["led"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bert_family_import_parity(tmp_path):
    """SPECTER2-class (BERT-family) encoder import: with every pair of
    positions inside the sliding window our longformer forward must equal
    the dense BERT forward (sotasum/mips.py:108-113 capability)."""
    from transformers import BertConfig, BertModel

    from retrieval_augmented_mds_tpu.models.hf_import import (
        load_encoder_from_pretrained,
    )
    from retrieval_augmented_mds_tpu.models.longformer import (
        longformer_encode,
    )

    t = 16  # <= window+1 ⇒ sliding window == full attention
    hf_cfg = BertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=t, pad_token_id=1,
    )
    torch.manual_seed(3)
    hf = BertModel(hf_cfg).eval()
    path = os.path.join(str(tmp_path), "tiny_bert")
    hf.save_pretrained(path, safe_serialization=True)

    cfg = EncoderConfig(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=t, window=t, max_globals=4, pos_offset=0,
    )
    params = load_encoder_from_pretrained(path, cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(4, 250, (2, t)).astype(np.int64)
    am = np.ones((2, t), np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        longformer_encode(
            params, cfg, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(am.astype(np.int32)),
            jnp.zeros((2, t), jnp.int32),  # no globals: pure local = dense here
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_adapter_zero_init_is_identity_and_import_works(tmp_path):
    """Pfeiffer bottleneck semantics: a zero up-projection adapter is a
    no-op (exactly how the adapters lib initializes); the adapter import
    path reads the `adapters`-library key layout (sotasum/mips.py:108-113)."""
    from transformers import BertConfig, BertModel

    from retrieval_augmented_mds_tpu.models.hf_import import (
        bert_params_from_hf,
    )
    from retrieval_augmented_mds_tpu.models.longformer import (
        init_longformer,
        longformer_encode,
    )

    t = 16
    cfg = EncoderConfig(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=t, window=t, max_globals=4, pos_offset=0, adapter_dim=8,
    )
    params = init_longformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(4, 250, (2, t)).astype(np.int32))
    mask = jnp.ones((2, t), jnp.int32)

    base = np.asarray(longformer_encode(params, cfg, ids, mask))

    # zero the up projections → identity adapter
    import copy

    z = copy.deepcopy(params)
    for lp in z["layers"]:
        lp["adapter"]["up"]["kernel"] = jnp.zeros_like(
            lp["adapter"]["up"]["kernel"]
        )
        lp["adapter"]["up"]["bias"] = jnp.zeros_like(
            lp["adapter"]["up"]["bias"]
        )
    no_adapter_cfg = EncoderConfig(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=t, window=t, max_globals=4, pos_offset=0,
    )
    na = copy.deepcopy(z)
    for lp in na["layers"]:
        del lp["adapter"]
    zero_out = np.asarray(longformer_encode(z, cfg, ids, mask))
    plain = np.asarray(longformer_encode(na, no_adapter_cfg, ids, mask))
    np.testing.assert_allclose(zero_out, plain, rtol=1e-6, atol=1e-6)
    # non-zero adapter changes the output
    assert not np.allclose(base, plain)

    # --- adapters-library key-layout import ------------------------------
    hf_cfg = BertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=t, pad_token_id=1,
    )
    torch.manual_seed(6)
    hf = BertModel(hf_cfg).eval()
    sd = dict(hf.state_dict())
    g = torch.Generator().manual_seed(8)
    for i in range(2):
        pre = f"encoder.layer.{i}.output.adapters.specter2"
        sd[f"{pre}.adapter_down.0.weight"] = torch.randn(8, 32, generator=g) * 0.1
        sd[f"{pre}.adapter_down.0.bias"] = torch.zeros(8)
        sd[f"{pre}.adapter_up.weight"] = torch.randn(32, 8, generator=g) * 0.1
        sd[f"{pre}.adapter_up.bias"] = torch.zeros(32)
    imported = bert_params_from_hf(sd, cfg, prefix="", adapter_name="specter2")
    assert all("adapter" in lp for lp in imported["layers"])
    out = np.asarray(longformer_encode(imported, cfg, ids, mask))
    # adapter actually participates: zeroing it changes the output
    z2 = copy.deepcopy(imported)
    for lp in z2["layers"]:
        lp["adapter"]["up"]["kernel"] = jnp.zeros_like(
            lp["adapter"]["up"]["kernel"]
        )
    out_z = np.asarray(longformer_encode(z2, cfg, ids, mask))
    assert not np.allclose(out, out_z)
