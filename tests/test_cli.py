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


@pytest.mark.slow
def test_crash_resume_bit_compatible(tmp_path):
    """train.save_every periodic checkpoints + deterministic per-step
    batch schedule: a run killed between saves and resumed from the last
    periodic checkpoint must land on EXACTLY the state of a run that was
    never interrupted (8-bit Adam state included). The reference gets
    the save side from Lightning's per-epoch ModelCheckpoint
    (config/no_mips.yaml:27-33) but makes no bit-compat promise.

    The persistent compile cache is disabled for this test: its AOT
    deserialization path can produce an executable with different
    instruction selection than a fresh in-process compile (the
    cpu_aot_loader machine-feature warnings), and fresh-vs-cached
    executables round f32 differently at the 1e-9 level — an
    environment artifact, not a trainer property. Executables already
    deserialized by EARLIER tests in the session can still be reused, so
    float leaves are compared at <=4 ULP instead of bitwise (a genuine
    trajectory divergence — different batch, store, or optimizer state —
    is orders of magnitude larger after one step); integer leaves (the
    8-bit moment state, step counts) must match exactly."""
    import dataclasses

    import jax
    import numpy as np

    def with_overrides(cfg, **over):
        # rebuild_every=1 makes the memory store a pure function of the
        # CURRENT params at every step — the precondition for exact
        # resume equivalence (at sparser cadences a resumed run rebuilds
        # at fit start from the loaded weights, as the reference does at
        # on_train_start, and legitimately diverges from the
        # uninterrupted schedule)
        return dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, save_every=2,
                                      adam_8bit=True),
            index=dataclasses.replace(cfg.index, rebuild_every=1),
            **over,
        )

    jax.config.update("jax_enable_compilation_cache", False)
    try:
        # never-interrupted run: 6 steps, saves at 2/4/6
        cont = with_overrides(
            _cfg(CFG, tmp_path, max_steps=6, eval_every=0,
                 ckpt_dir=str(tmp_path / "cont_ckpt"))
        )
        run_fit(cont)

        # interrupted run: stopped at step 3 (mid save-interval: periodic
        # save at 2, final-state save at 3 — the tail interval must not
        # be lost on completion)
        crash = with_overrides(
            _cfg(CFG, tmp_path, max_steps=3, eval_every=0,
                 ckpt_dir=str(tmp_path / "crash_ckpt"))
        )
        run_fit(crash)
        latest = json.load(open(tmp_path / "crash_ckpt" / "latest.json"))
        assert latest["step"] == 3  # final save; resume re-enters mid-epoch

        # resume to 6
        resumed = dataclasses.replace(crash, max_steps=6)
        run_fit(resumed)
    finally:
        jax.config.update("jax_enable_compilation_cache", True)

    a = np.load(tmp_path / "cont_ckpt" / "step_6.npz")
    b = np.load(tmp_path / "crash_ckpt" / "step_6.npz")
    assert set(a.files) == set(b.files)
    for k in a.files:
        if np.issubdtype(a[k].dtype, np.floating):
            np.testing.assert_array_max_ulp(a[k], b[k], maxulp=4)
        elif a[k].dtype in (np.int8, np.uint8):
            # quantized moments: a float ULP of jitter upstream can move
            # a code by at most one
            d = a[k].astype(np.int32) - b[k].astype(np.int32)
            assert np.max(np.abs(d)) <= 1, k
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_periodic_save_protects_best_checkpoint(tmp_path):
    """A best-marked checkpoint survives later periodic saves (keep-N
    prune must not evict it), and validate-time loading prefers it."""
    from retrieval_augmented_mds_tpu.train.trainer import TrainState
    from retrieval_augmented_mds_tpu.utils.checkpoint import (
        load_train_state,
        mark_best,
        save_train_state,
    )

    import jax.numpy as jnp

    state = TrainState(params={"w": jnp.arange(4.0)},
                       opt_state=(), step=jnp.int32(0))
    ckpt = str(tmp_path / "ckpt")
    p2 = save_train_state(ckpt, state, 2)
    mark_best(ckpt, 2, p2, 0.5)
    state4 = TrainState(params={"w": jnp.arange(4.0) + 1},
                        opt_state=(), step=jnp.int32(0))
    save_train_state(ckpt, state4, 4)
    save_train_state(ckpt, state4, 6)
    # best (step 2) survived the keep-1 prune; latest points at 6
    assert os.path.exists(p2)
    assert json.load(open(os.path.join(ckpt, "latest.json")))["step"] == 6
    best_state, best_step = load_train_state(ckpt, state, prefer="best")
    assert best_step == 2
    import numpy as np

    np.testing.assert_array_equal(np.asarray(best_state.params["w"]),
                                  np.arange(4.0))
