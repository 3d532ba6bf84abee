"""Generate the committed arXiv parquet fixture
(data/fixtures/arxiv_64.parquet).

Shape-matches the parquet the reference's `load_mips_arxiv2` consumes
(sotasum/data_loaders.py:129-157): an `abstract` column with raw arXiv
text (newlines, `$...$` / `\\[...\\]` math, irregular whitespace) plus a
pandas `__index_level_0__` index column that becomes the article id.
Includes exact-duplicate abstracts so the dedup path is exercised.

Run from the repo root:  python tools/make_arxiv_fixture.py
"""

import os

import numpy as np
import pandas as pd

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "retrieval_augmented_mds_tpu", "data", "fixtures", "arxiv_64.parquet",
)


def main(n: int = 64, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    words = [f"term{i}" for i in range(80)]

    def abstract(i: int) -> str:
        k = int(rng.integers(20, 40))
        body = " ".join(rng.choice(words, k))
        math = rng.choice(
            ["$x^2 + y_i$", "$$\\alpha\\beta$$", "\\[\\sum_i a_i\\]", ""]
        )
        return (
            f"Paper {i}.\n{body}  {math}\n"
            f"We show {' '.join(rng.choice(words, 8))}."
        )

    texts = [abstract(i) for i in range(n - 8)]
    texts += list(rng.choice(texts, 8))  # duplicates → dedup coverage
    df = pd.DataFrame({"abstract": texts})
    # a non-trivial pandas index → parquet writes __index_level_0__
    df.index = np.arange(1000, 1000 + len(df))
    df.to_parquet(OUT)
    return OUT


if __name__ == "__main__":
    print(main())
