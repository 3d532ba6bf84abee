"""Native async batch assembler (native/batch_loader.cpp) vs the Python
gather: identical batches, safe buffer lifetime, pipeline integration.

Reference behavior matched: torch DataLoader worker collation
(sotasum/data_modules.py:287-321) — batches assembled off the training
thread into reused buffers.
"""

import numpy as np
import pytest

from retrieval_augmented_mds_tpu.data.native_loader import (
    native_available,
    native_batches,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _examples(n=53, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(0, 1000, (n, 16)).astype(np.int32),
        "attention_mask": np.ones((n, 16), np.int32),
        "labels": rng.integers(0, 1000, (n, 8)).astype(np.int32),
        "aid_counts": rng.integers(1, 5, (n,)).astype(np.int32),
        "floats": rng.standard_normal((n, 4, 3)).astype(np.float32),
    }


def test_matches_python_gather():
    ex = _examples()
    rng = np.random.default_rng(1)
    order = rng.permutation(52)  # 13 batches of 4
    assert len(list(native_batches(ex, order, 4))) == 13
    for i, b in enumerate(native_batches(ex, order, 4)):
        sel = order[i * 4 : (i + 1) * 4]
        for k, v in ex.items():
            assert np.array_equal(b[k], v[sel]), (i, k)


def test_retained_batches_never_alias_ring_slots():
    # Yielded batches are copies: holding every batch across the whole
    # epoch (as an async device transfer might) must not observe slot
    # refills. With only 3 ring slots, aliasing would corrupt batch 0 by
    # the time batch 3 is produced.
    ex = _examples()
    rng = np.random.default_rng(2)
    order = rng.permutation(52)
    held = list(native_batches(ex, order, 4))
    for i, b in enumerate(held):
        sel = order[i * 4 : (i + 1) * 4]
        for k, v in ex.items():
            assert np.array_equal(b[k], v[sel]), (i, k)


def test_abandoned_iterator_batches_stay_valid():
    ex = _examples()
    order = np.arange(52)
    it = native_batches(ex, order, 4)
    first = next(it)
    del it  # generator GC -> loader destroyed; yielded copies unaffected
    import gc

    gc.collect()
    for k, v in ex.items():
        assert np.array_equal(first[k], v[:4]), k


def test_setup_errors_raise_at_call_time():
    # Creation-time failures must surface before the first batch is
    # consumed (pipeline.batches narrows its fallback guard to creation).
    ex = _examples()
    with pytest.raises(Exception):
        native_batches(ex, np.arange(5), 4)  # not a multiple of batch_size


def test_pipeline_batches_native_equals_python():
    from retrieval_augmented_mds_tpu.data import (
        HashTokenizer,
        RAGDataModule,
        synthetic_multi_x_science,
    )

    dm = RAGDataModule(
        df=synthetic_multi_x_science(24),
        tokenizer=HashTokenizer(vocab_size=512),
        query_tokenizer=HashTokenizer(vocab_size=512),
        max_length=32,
        query_max_length=16,
        decoder_max_length=16,
        memory_len=16,
    ).prepare()
    py = [
        {k: v.copy() for k, v in b.items()}
        for b in dm.batches(4, shuffle=True, seed=3, native=False)
    ]
    nat = [
        {k: v.copy() for k, v in b.items()}
        for b in dm.batches(4, shuffle=True, seed=3, native=True)
    ]
    assert len(py) == len(nat) > 0
    for bp, bn in zip(py, nat):
        assert sorted(bp) == sorted(bn)
        for k in bp:
            assert np.array_equal(bp[k], bn[k]), k
