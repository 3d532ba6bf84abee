"""Data layer: corpus semantics, tokenization, pipeline shapes."""

import os

import numpy as np
import pytest

from retrieval_augmented_mds_tpu.data import (
    HashTokenizer,
    RAGDataModule,
    build_mips_corpus,
    prepare_pretrain_pairs,
    strip_cites,
    synthetic_multi_x_science,
)
from retrieval_augmented_mds_tpu.data.corpus import add_aid_counts, aggregate_by_aid


def test_strip_cites():
    assert strip_cites("see @cite_12 and @cite_3.") == "see cite and cite."


def test_mips_corpus_dedup_and_aggregation():
    df = synthetic_multi_x_science(40)
    corpus = build_mips_corpus(df, "ref_abstract")
    # dedup: unique text
    assert corpus["mips_column"].is_unique
    # no empties survived
    assert (corpus["mips_column"] != "").all()
    # aggregated id lists: every source example index present somewhere
    all_idx = {i for row in corpus["index"] for i in row}
    exploded = {
        int(r["index"])
        for _, r in df.iterrows()
        if any(a != "" for a in r["ref_abstract"]["abstract"])
    }
    assert exploded <= all_idx


def test_related_work_corpus():
    df = synthetic_multi_x_science(10)
    corpus = build_mips_corpus(df, "related_work")
    assert len(corpus) == 10
    assert not corpus["mips_column"].str.contains("@cite").any()


def test_aggregate_by_aid():
    df = synthetic_multi_x_science(20)
    df2 = df.copy()
    df2.loc[1, "aid"] = df2.loc[0, "aid"]  # force a duplicate aid
    agg = aggregate_by_aid(df2)
    assert agg["aid"].is_unique
    assert len(agg) == 19


def test_hash_tokenizer_roundtrip_properties():
    tok = HashTokenizer(vocab_size=512)
    out = tok(["hello world", "hello"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    # deterministic
    out2 = tok(["hello world", "hello"], max_length=8)
    assert np.array_equal(out["input_ids"], out2["input_ids"])
    # same word → same id across positions
    a = tok(["foo foo"], max_length=8)["input_ids"][0]
    assert a[1] == a[2]
    assert a[0] == tok.bos_id


def test_rag_datamodule_end_to_end():
    df = synthetic_multi_x_science(32)
    tok = HashTokenizer(512)
    dm = RAGDataModule(
        df, tok, tok, max_length=128, query_max_length=64,
        decoder_max_length=32, memory_len=64,
    ).prepare()
    assert dm.corpus_size > 0
    b = next(dm.batches(4))
    assert b["input_ids"].shape == (4, 128)
    assert b["labels"].shape == (4, 32)
    assert b["mips_ignore"].shape[0] == 4
    assert b["gold_aid"].shape == (4,)
    # doc_sep token present in joined inputs (multi-ref examples)
    assert (b["input_ids"] == tok.doc_sep_id).sum() >= 0
    # self-exclusion lists point at real corpus rows
    ig = b["mips_ignore"]
    assert ig.max() < dm.corpus_size


def test_pretrain_pairs():
    df = synthetic_multi_x_science(16)
    tok = HashTokenizer(512)
    pairs = prepare_pretrain_pairs(df, tok, tok, mode="abstract",
                                   query_max_length=32, mips_max_length=32)
    assert pairs["query_input_ids"].shape == pairs["mips_input_ids"].shape
    pairs2 = prepare_pretrain_pairs(df, tok, tok, mode="related",
                                    query_max_length=32, mips_max_length=32)
    assert pairs2["query_input_ids"].shape[0] == 16


def test_aid_counts():
    df = synthetic_multi_x_science(10)
    df.loc[1, "aid"] = df.loc[0, "aid"]
    out = add_aid_counts(df)
    assert out.loc[0, "aid_counts"] == 2
    assert out.loc[2, "aid_counts"] == 1


def test_dual_memory_and_prompt_prefix():
    df = synthetic_multi_x_science(12)
    tok = HashTokenizer(512)
    dm = RAGDataModule(
        df, tok, tok, max_length=64, query_max_length=32,
        decoder_max_length=16, memory_len=32, dual_memory=True,
        prompt_prefix="summarize: ",
    ).prepare()
    b = next(dm.batches(4))
    assert b["input_memory_ids"].shape == (4, 4, 32)
    assert b["input_memory_count"].min() >= 1
    # prompt prefix tokens prepended to every input
    first = tok("summarize: ", max_length=8)["input_ids"][0]
    assert b["input_ids"][0, 1] == first[1]


def test_arxiv_corpus_to_store_arrays():
    """arXiv corpus loader wires into MemoryStore arrays."""
    import pandas as pd

    from retrieval_augmented_mds_tpu.data.corpus import load_mips_arxiv
    from retrieval_augmented_mds_tpu.data.pipeline import (
        prepare_memory_store_arrays,
    )

    df = pd.DataFrame(
        {
            "abstract_text": [
                ["<S>alpha one.</S>", "<S>alpha  two.</S>"],
                ["<S>gamma.</S>"],
            ],
            "article_id": ["a0", "a1"],
        }
    )
    corpus = load_mips_arxiv(df)
    # <S>/</S> stripped, sentences joined, whitespace collapsed
    # (reference load_mips_arxiv, data_loaders.py:98-125)
    assert corpus["mips_column"].tolist() == [
        "alpha one. alpha two.", "gamma."
    ]
    assert corpus["aid"].tolist() == [["a0"], ["a1"]]
    assert all(len(ix) == 0 for ix in corpus["index"])
    tok = HashTokenizer(128)
    arrays = prepare_memory_store_arrays(corpus, tok, memory_len=16)
    assert arrays["token_ids"].shape == (2, 16)


def test_split_partition_disjoint_and_complete():
    df = synthetic_multi_x_science(30)
    tok = HashTokenizer(512)
    dm = RAGDataModule(df, tok, tok, max_length=32, query_max_length=16,
                       decoder_max_length=8, memory_len=16).prepare()
    tr = set(dm.split_indices("train"))
    va = set(dm.split_indices("val"))
    te = set(dm.split_indices("test"))
    assert not (tr & va) and not (tr & te) and not (va & te)
    assert tr | va | te == set(range(dm.n_examples))


FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "retrieval_augmented_mds_tpu", "data", "fixtures",
)


def test_clean_arxiv_text_math_substitution():
    """Reference clean_arxiv (sotasum/data_loaders.py:132-140)."""
    from retrieval_augmented_mds_tpu.data.corpus import clean_arxiv_text

    raw = "We prove\n$x^2 + 1$ and  \\[\\sum a_i\\]   holds $$y$$."
    got = clean_arxiv_text(raw)
    assert "\n" not in got and "  " not in got
    assert got == "We prove @math and @math holds @math."


def test_load_mips_arxiv2_parquet_fixture():
    """load_mips_arxiv2 (data_loaders.py:129-157): parquet read, @math
    substitution, dedup by cleaned text, article ids preserved."""
    from retrieval_augmented_mds_tpu.data.corpus import load_mips_arxiv2

    corpus = load_mips_arxiv2(os.path.join(FIXDIR, "arxiv_64.parquet"))
    assert 0 < len(corpus) < 64  # the 8 duplicated abstracts dedup away
    assert corpus["mips_column"].is_unique
    assert not corpus["mips_column"].str.contains("\\$").any()
    assert corpus["mips_column"].str.contains("@math").any()
    # arXiv rows tie to no training example → empty index lists
    assert all(len(ix) == 0 for ix in corpus["index"])
    # aids from the parquet pandas index (reference __index_level_0__)
    assert all(len(a) == 1 and int(a[0]) >= 1000 for a in corpus["aid"])


def test_arxiv_x_science_concat_and_datamodule():
    """arXiv-first concat (data_loaders.py:160-191) feeding the full data
    module: Multi-XScience rows keep self-exclusion; arXiv rows extend the
    searchable corpus."""
    from retrieval_augmented_mds_tpu.data.corpus import (
        build_mips_corpus,
        load_mips_arxiv2,
        load_mips_arxiv_x_science,
    )

    pq = os.path.join(FIXDIR, "arxiv_64.parquet")
    df = synthetic_multi_x_science(24)
    ax = load_mips_arxiv2(pq)
    mx = build_mips_corpus(df)
    corpus = load_mips_arxiv_x_science(pq, df)
    assert len(corpus) == len(ax) + len(mx)
    # arXiv rows first (reference concat order)
    assert list(corpus["mips_column"][: len(ax)]) == list(ax["mips_column"])

    tok = HashTokenizer(512)
    dm = RAGDataModule(
        df, tok, tok, max_length=32, query_max_length=16,
        decoder_max_length=8, memory_len=16,
        mips_dataset="arxiv_x_science", arxiv_path=pq,
    ).prepare()
    assert dm.corpus_size == len(corpus)
    batch = next(dm.batches(4, native=False))
    # self-exclusion rows point at multix corpus rows (offset past arXiv)
    mi = batch["mips_ignore"]
    assert (mi[mi >= 0] >= len(ax)).all()


def test_unknown_mips_dataset_raises():
    df = synthetic_multi_x_science(8)
    tok = HashTokenizer(512)
    with pytest.raises(ValueError, match="mips_dataset"):
        RAGDataModule(df, tok, tok, mips_dataset="bogus").prepare()
