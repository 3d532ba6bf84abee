"""CLI end-to-end smoke: fit/validate/predict/pretrain on synthetic data."""

import json
import os

import pytest

from retrieval_augmented_mds_tpu.cli import (
    run_fit,
    run_predict,
    run_pretrain_retriever,
)
from retrieval_augmented_mds_tpu.utils.config import load_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "smoke.yaml")
NO_MIPS = os.path.join(os.path.dirname(__file__), "..", "configs", "no_mips.yaml")


def _cfg(path, tmp_path, **over):
    import dataclasses

    cfg = load_config(path)
    log = dataclasses.replace(cfg.logging, log_dir=str(tmp_path))
    return dataclasses.replace(cfg, logging=log, **over)


@pytest.mark.slow
def test_fit_smoke(tmp_path):
    cfg = _cfg(CFG, tmp_path, max_steps=4, eval_every=4,
               ckpt_dir=str(tmp_path / "ckpt"))
    out = run_fit(cfg)
    assert out["steps"] == 4
    assert "loss" in out
    # metrics jsonl written
    lines = open(tmp_path / "smoke.metrics.jsonl").read().strip().splitlines()
    assert len(lines) >= 4
    assert "loss" in json.loads(lines[0])
    # checkpoint written
    assert os.path.exists(tmp_path / "ckpt" / "latest.json")


def test_fit_no_mips(tmp_path):
    cfg = _cfg(NO_MIPS, tmp_path, max_steps=2, eval_every=0)
    out = run_fit(cfg)
    assert out["steps"] == 2


@pytest.mark.slow
def test_predict_smoke(tmp_path):
    cfg = _cfg(CFG, tmp_path, max_steps=1)
    out = run_predict(cfg)
    assert len(out["predictions"]) == cfg.data.batch_size
    assert all(isinstance(s, str) for s in out["predictions"])


def test_export_serving_step_roundtrip(tmp_path):
    """`export` serializes the full serving step (rag_encode + generate)
    via jax.export; the deserialized artifact must reproduce the live
    path's token ids without any model code."""
    import jax
    from jax import export as jexport

    from retrieval_augmented_mds_tpu.cli import (
        _device_batch,
        build_data,
        build_store,
        run_export,
    )
    from retrieval_augmented_mds_tpu.models.generate import generate
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        init_rag_pretrained,
        rag_encode,
    )

    cfg = _cfg(CFG, tmp_path)
    out = run_export(cfg, str(tmp_path / "export"))
    assert os.path.exists(out["artifact"]) and out["bytes"] > 0

    blob = open(out["artifact"], "rb").read()
    exp = jexport.deserialize(blob)

    dm, _tok = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    store = build_store(params, cfg, dm)
    batch = next(dm.batches(cfg.data.batch_size, shuffle=False))
    dbatch = {
        k: v for k, v in _device_batch(batch, cfg).items() if k != "labels"
    }
    store_leaves = tuple(jax.tree_util.tree_flatten(store)[0])
    got = exp.call(params, store_leaves, dbatch)
    enc = rag_encode(params, cfg.model, store, dbatch)
    want = generate(params, cfg.model, enc, cfg.generation)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pretrain_retriever_smoke(tmp_path):
    cfg = _cfg(CFG, tmp_path, max_steps=2, ckpt_dir=str(tmp_path / "ck"))
    out = run_pretrain_retriever(cfg)
    assert "train_accuracy" in out
    assert os.path.exists(tmp_path / "ck" / "encoders.npz")


def test_pretrain_retriever_periodic_validation_and_predict(tmp_path):
    """Round-3 pretrain-CLI parity (reference pretrain.py:481-587,686-718):
    periodic full-KB validation during training, checkpoint on best
    average_precision, and a predict-mode top-k ranking dump."""
    from retrieval_augmented_mds_tpu.cli import run_pretrain_retriever_predict

    run_name = "smoke"
    cfg = _cfg(CFG, tmp_path, max_steps=4, eval_every=2,
               ckpt_dir=str(tmp_path / "ck"))
    out = run_pretrain_retriever(cfg)
    assert out["best_average_precision"] >= 0
    assert os.path.exists(tmp_path / "ck" / "encoders.npz")
    # periodic validation metrics appear over time in the metrics stream
    lines = [
        json.loads(ln)
        for ln in open(
            tmp_path / f"{run_name}_retriever.metrics.jsonl"
        ).read().strip().splitlines()
    ]
    val_rows = [
        row for row in lines
        if any(k.startswith("val_average_precision") for k in row)
    ]
    assert len(val_rows) >= 2  # mid-training (step 2) + end-of-run
    # predict mode: loads the exported encoders and dumps rankings
    pout = run_pretrain_retriever_predict(cfg)
    assert pout["n_queries"] > 0
    dump = json.load(open(tmp_path / "retriever_predictions.json"))
    assert len(dump) == pout["n_queries"]
    assert {"query", "retrieved", "scores", "hits"} <= set(dump[0])


@pytest.mark.slow
def test_fit_resume_from_checkpoint(tmp_path):
    cfg = _cfg(CFG, tmp_path, max_steps=2, eval_every=2,
               ckpt_dir=str(tmp_path / "ckpt"))
    run_fit(cfg)
    assert os.path.exists(tmp_path / "ckpt" / "latest.json")
    # resume: second run starts at the saved step and extends
    cfg2 = _cfg(CFG, tmp_path, max_steps=3, eval_every=0,
                ckpt_dir=str(tmp_path / "ckpt"))
    out = run_fit(cfg2)
    assert out["steps"] == 3


def test_fit_baseline_bart(tmp_path):
    from retrieval_augmented_mds_tpu.cli import run_fit_baseline

    cfg = _cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "baseline_bart.yaml"),
        tmp_path, max_steps=3,
    )
    out = run_fit_baseline(cfg)
    assert out["steps"] == 3
    assert "rouge1" in out


def test_fit_baseline_t5(tmp_path):
    import dataclasses

    from retrieval_augmented_mds_tpu.cli import run_fit_baseline

    cfg = _cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "baseline_bart.yaml"),
        tmp_path, max_steps=2, baseline="t5",
    )
    out = run_fit_baseline(cfg)
    assert out["steps"] == 2


def test_fit_with_ivf_factory(tmp_path):
    """End-to-end fit through the IVF factory path (IVF16,Flat)."""
    import dataclasses

    cfg = _cfg(CFG, tmp_path, max_steps=2, eval_every=0)
    cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, factory="IVF8,Flat",
                                       rebuild_every=2),
    )
    out = run_fit(cfg)
    assert out["steps"] == 2


def test_fit_with_target_in_memory_forcing(tmp_path):
    import dataclasses

    cfg = _cfg(CFG, tmp_path, max_steps=2, eval_every=0)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, memory_forcing="target_in", copy_forcing=1.0
        ),
    )
    out = run_fit(cfg)
    assert out["steps"] == 2
