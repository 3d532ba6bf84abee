"""HF weight export: our encoders round-trip into `transformers`.

Closes the interop loop of hf_import.py in the other direction — the
reference hands trained retrievers back to the HF ecosystem via
`save_pretrained` (sotasum/pretrain.py:671-681); here a framework-trained
longformer pytree must reload as a stock `LongformerModel` and reproduce
our forward outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from retrieval_augmented_mds_tpu.models.config import EncoderConfig  # noqa: E402
from retrieval_augmented_mds_tpu.models.hf_export import (  # noqa: E402
    save_encoder_pretrained,
)
from retrieval_augmented_mds_tpu.models.longformer import (  # noqa: E402
    init_longformer,
    longformer_encode,
)

W = 32
T = 4 * W


def _tiny_cfg(**kw):
    d = dict(
        vocab_size=256, d_model=32, n_heads=2, n_layers=2, d_ffn=64,
        max_len=T, window=W, max_globals=8, pos_offset=2,
    )
    d.update(kw)
    return EncoderConfig(**d)


def test_export_reloads_and_matches_logits(tmp_path):
    from transformers import LongformerModel

    cfg = _tiny_cfg()
    params = init_longformer(jax.random.PRNGKey(0), cfg)
    manifest = save_encoder_pretrained(params, cfg, str(tmp_path / "hf"))
    assert manifest["n_tensors"] > 0 and not manifest["adapter"]

    hf = LongformerModel.from_pretrained(str(tmp_path / "hf")).eval()

    rng = np.random.default_rng(3)
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


def test_export_import_roundtrip_is_identity(tmp_path):
    """export → hf_import must reproduce the original pytree bit-exactly
    (both sides are pure renames/transposes)."""
    from retrieval_augmented_mds_tpu.models.hf_import import (
        load_encoder_from_pretrained,
    )

    cfg = _tiny_cfg()
    params = init_longformer(jax.random.PRNGKey(1), cfg)
    save_encoder_pretrained(params, cfg, str(tmp_path / "hf"))
    back = load_encoder_from_pretrained(str(tmp_path / "hf"), cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(back)
    }
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_b, ks
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(flat_b[ks], np.float32),
            err_msg=ks,
        )


def test_export_saves_adapter_sidecar(tmp_path):
    import os

    cfg = _tiny_cfg(adapter_dim=8)
    params = init_longformer(jax.random.PRNGKey(2), cfg)
    manifest = save_encoder_pretrained(params, cfg, str(tmp_path / "hf"))
    assert manifest["adapter"]
    assert os.path.exists(tmp_path / "hf" / "adapter.npz")
    side = np.load(tmp_path / "hf" / "adapter.npz")
    np.testing.assert_array_equal(
        side["layers.0.down.kernel"],
        np.asarray(params["layers"][0]["adapter"]["down"]["kernel"],
                   np.float32),
    )
