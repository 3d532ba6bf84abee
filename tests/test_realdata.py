"""Real-schema data path: fixture corpus, tokenize cache, loud tokenizer
failure, full-split eval, refresh==build identity.

Round-2 closure of VERDICT.md missing #2/#3/#5 and weak #4/#5: the whole
round-1 pipeline only ever saw `synthetic_multi_x_science` word salad;
these tests run the committed real-schema Multi-XScience fixture
(tools/make_fixture.py) end to end and pin the behaviors the reference
gets from its offline Arrow cache + full Lightning eval epochs.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from retrieval_augmented_mds_tpu.cli import build_data, build_store, run_fit
from retrieval_augmented_mds_tpu.utils.config import load_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "smoke.yaml")


def _cfg(tmp_path, **over):
    cfg = load_config(CFG)
    log = dataclasses.replace(cfg.logging, log_dir=str(tmp_path))
    return dataclasses.replace(cfg, logging=log, **over)


def _fixture_cfg(tmp_path, **over):
    cfg = _cfg(tmp_path, **over)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, source="fixture")
    )


def test_fixture_schema_and_corpus_semantics(tmp_path):
    """The committed fixture has the real Multi-XScience schema and the
    statistical properties the corpus builder must handle: shared refs
    (dedup+aggregate merges rows), empty abstracts (dropped), @cite_N."""
    from retrieval_augmented_mds_tpu.data.corpus import load_fixture

    df = load_fixture()
    assert len(df) == 200
    assert set(df.columns) >= {
        "aid", "mid", "abstract", "related_work", "ref_abstract", "index"
    }
    r0 = df.iloc[0]["ref_abstract"]
    assert set(r0.keys()) == {"cite_N", "mid", "abstract"}
    assert any(
        "" in row["abstract"] for _, row in df.iterrows()
        for row in [row["ref_abstract"]]
    )
    assert df["related_work"].str.contains("@cite_").all()

    dm, tok = build_data(_fixture_cfg(tmp_path))
    total_refs = sum(
        1 for _, it in df.iterrows() for a in it["ref_abstract"]["abstract"]
        if a
    )
    n_corpus = dm.corpus_size
    # dedup collapsed the shared reference pool
    assert n_corpus < total_refs
    # aggregation: some corpus rows are cited by multiple examples
    assert any(len(ix) > 1 for ix in dm.corpus["index"])
    # @cite markers stripped from targets
    decoded = tok.batch_decode(dm.examples["labels"][:4])
    assert all("@cite" not in d for d in decoded)


@pytest.mark.slow
def test_fixture_fit_and_full_validate(tmp_path):
    """End-to-end vertical slice on real-schema text: fit a few steps with
    MIPS + rebuild, then a FULL val-split eval epoch (every example
    scored, reference lightning_model.py:327-398)."""
    from retrieval_augmented_mds_tpu.cli import run_validate

    cfg = _fixture_cfg(tmp_path, max_steps=2, eval_every=0)
    out = run_fit(cfg)
    assert out["steps"] == 2
    assert np.isfinite(out["loss"])

    ev = run_validate(cfg, split="val")
    assert "rouge1" in ev
    # full split: the output dump covers every val example (80/10/10 split
    # of 200 → 20), including the ragged tail batch
    dumps = [p for p in os.listdir(tmp_path) if p.startswith("val_outputs")]
    assert dumps
    outputs = json.load(open(tmp_path / dumps[0]))
    dm, _ = build_data(cfg)
    assert len(outputs) == len(dm.split_indices("val"))


def test_tokenize_cache_roundtrip(tmp_path):
    """data.cache_dir: second prepare() loads identical arrays from the
    npz cache instead of re-tokenizing (reference prepare_data →
    save_to_disk → load_from_disk, data_modules.py:84,268)."""
    cache = str(tmp_path / "tok_cache")
    cfg = _fixture_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_dir=cache)
    )
    dm1, _ = build_data(cfg)
    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".npz")
    mtime = os.path.getmtime(os.path.join(cache, files[0]))

    dm2, _ = build_data(cfg)
    assert os.path.getmtime(os.path.join(cache, files[0])) == mtime
    for k in dm1.examples:
        np.testing.assert_array_equal(dm1.examples[k], dm2.examples[k])
    for k in dm1.store_arrays:
        np.testing.assert_array_equal(dm1.store_arrays[k], dm2.store_arrays[k])

    # a different length → different cache entry, not a stale hit
    cfg3 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_dir=cache,
                                      max_length=256)
    )
    dm3, _ = build_data(cfg3)
    assert len(os.listdir(cache)) == 2
    assert dm3.examples["input_ids"].shape[1] == 256


@pytest.mark.slow
def test_named_tokenizer_failure_is_loud():
    """A typo'd tokenizer name must raise, not silently hash-tokenize
    (VERDICT weak #4); fallback='hash' warns."""
    import warnings

    from retrieval_augmented_mds_tpu.data import load_tokenizer

    with pytest.raises(RuntimeError, match="failed to load"):
        load_tokenizer("no-such-org/no-such-tokenizer-xyz")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tok = load_tokenizer(
            "no-such-org/no-such-tokenizer-xyz", fallback="hash"
        )
    assert any("FALLING BACK" in str(x.message) for x in w)
    assert tok("hello world", max_length=8)["input_ids"].shape == (1, 8)


def test_refresh_is_bit_identical_to_fresh_build(tmp_path):
    """The train-time refresh runs the SAME embed+build path as the
    initial build: equal params ⇒ bit-identical index (VERDICT #8)."""
    import jax

    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        init_rag,
    )

    for factory in ("Flat", "IVF8,SQ8"):
        cfg = _cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, index=dataclasses.replace(cfg.index, factory=factory),
            precision="bfloat16",
        )
        dm, _ = build_data(cfg)
        params = init_rag(jax.random.PRNGKey(0), cfg.model)
        fresh = build_store(params, cfg, dm)
        refreshed = build_store(
            params, cfg, token_ids=fresh.token_ids,
            token_mask=fresh.token_mask, row_aids=fresh.row_aids,
        )
        a = jax.tree_util.tree_leaves(fresh.index)
        b = jax.tree_util.tree_leaves(refreshed.index)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_t5_prompt_prefix_reaches_tokenization(tmp_path):
    """The 'summarize: ' prefix must be applied BEFORE tokenization
    (was a silent no-op: set after prepare())."""
    cfg = _cfg(tmp_path)
    dm_plain, tok = build_data(cfg)
    dm_t5, _ = build_data(cfg, prompt_prefix="summarize: ")
    assert not np.array_equal(
        dm_plain.examples["input_ids"], dm_t5.examples["input_ids"]
    )
    first = tok.batch_decode(dm_t5.examples["input_ids"][:1])[0]
    plain_first = tok.batch_decode(dm_plain.examples["input_ids"][:1])[0]
    assert first != plain_first
