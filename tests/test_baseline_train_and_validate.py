"""Baseline train steps + retriever full-KB validation + ingestion."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.models.config import Seq2SeqConfig
from retrieval_augmented_mds_tpu.train.baseline import (
    make_seq2seq_train_step,
    seq2seq_greedy,
)
from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
from retrieval_augmented_mds_tpu.train.trainer import TrainState

CFG = Seq2SeqConfig(
    vocab_size=128, d_model=32, n_heads=2, enc_layers=1, dec_layers=1,
    d_ffn=64, max_src_len=32, max_tgt_len=16,
)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(4, 120, (4, 24)).astype(np.int32)),
        "attention_mask": jnp.ones((4, 24), jnp.int32),
        "labels": jnp.asarray(rng.integers(4, 120, (4, 8)).astype(np.int32)),
    }


def _run_family(family, init_fn):
    params = init_fn(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(3e-3, 1, 100)
    state = TrainState.create(params, tx)
    step = make_seq2seq_train_step(family, CFG, tx)
    batch = _batch()
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], (family, losses)
    out = seq2seq_greedy(family, state.params, CFG, batch["input_ids"],
                         batch["attention_mask"], max_new_tokens=6)
    assert out.shape == (4, 6)


def test_bart_baseline_trains():
    from retrieval_augmented_mds_tpu.models.bart import init_bart

    _run_family("bart", init_bart)


def test_t5_baseline_trains():
    from retrieval_augmented_mds_tpu.models.t5 import init_t5

    _run_family("t5", init_t5)


def test_validate_retriever_full_kb():
    from retrieval_augmented_mds_tpu.models.config import EncoderConfig
    from retrieval_augmented_mds_tpu.models.longformer import init_longformer
    from retrieval_augmented_mds_tpu.retriever.validate import validate_retriever

    ecfg = EncoderConfig.tiny()
    params = {
        "query_encoder": init_longformer(jax.random.PRNGKey(0), ecfg),
        "mips_encoder": init_longformer(jax.random.PRNGKey(0), ecfg),
    }
    rng = np.random.default_rng(0)
    n, L, q = 32, 64, 8
    corpus_ids = rng.integers(4, ecfg.vocab_size, (n, L)).astype(np.int32)
    corpus = {
        "token_ids": corpus_ids,
        "token_mask": np.ones((n, L), np.int32),
    }
    row_aids = np.arange(n, dtype=np.int32)[:, None]
    # queries = exact copies of corpus docs → shared encoder weights must
    # retrieve the matching doc at rank 1
    sel = rng.choice(n, q, replace=False)
    queries = {
        "query_input_ids": corpus_ids[sel],
        "query_attention_mask": np.ones((q, L), np.int32),
    }
    m = validate_retriever(
        params, ecfg, ecfg, corpus, row_aids, queries,
        gold_aid=sel.astype(np.int32), gold_counts=np.ones(q, np.int32), k=5,
    )
    assert m["recall"] == 1.0
    assert m["reciprocal_rank"] == 1.0


def test_ingest_arxiv_jsonl(tmp_path):
    from retrieval_augmented_mds_tpu.data.ingest import build_scientific_papers

    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "a.jsonl", "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "article_id": f"x{i}",
                "abstract_text": [f"abs {i}"],
                "article_text": [f"body {i}"],
                "section_names": ["intro"],
            }) + "\n")
    out = tmp_path / "out.parquet"
    n = build_scientific_papers(str(src), str(out))
    assert n == 3
    import pandas as pd

    df = pd.read_parquet(out)
    assert list(df["article_id"]) == ["x0", "x1", "x2"]


def test_ingest_openalex(tmp_path):
    import gzip

    from retrieval_augmented_mds_tpu.data.ingest import build_openalex_abstracts

    src = tmp_path / "snap"
    os.makedirs(src)
    with gzip.open(src / "part.gz", "wt") as f:
        f.write(json.dumps({
            "id": "W1", "title": "t",
            "abstract_inverted_index": {"hello": [0], "world": [1]},
        }) + "\n")
    out = tmp_path / "oa.parquet"
    n = build_openalex_abstracts(str(src), str(out))
    assert n == 1
    import pandas as pd

    assert pd.read_parquet(out)["abstract"][0] == "hello world"
