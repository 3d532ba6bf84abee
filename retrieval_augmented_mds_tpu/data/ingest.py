"""One-off dataset ingestion utilities.

Port of sotasum/data_utils.py: arXiv "long-summarization" JSONL → Arrow
(`build_scientific_papers`, data_utils.py:41-53 with `_read_json` at
:10-38) and the OpenAlex S3-snapshot → parquet pass (:56-73). Host-side,
pyarrow-backed; no torch.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Iterator

import pandas as pd


def read_jsonl(path: str, limit: int | None = None) -> Iterator[dict]:
    """Stream records from a JSONL file (plain or .gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        for i, line in enumerate(f):
            if limit is not None and i >= limit:
                break
            line = line.strip()
            if line:
                yield json.loads(line)


def build_scientific_papers(
    src_dir: str, out_path: str, *, limit: int | None = None
) -> int:
    """arXiv long-summarization JSONL files → one Arrow/parquet table with
    columns (article_id, abstract, article, section_names)."""
    rows = []
    for path in sorted(glob.glob(os.path.join(src_dir, "*.jsonl*")) +
                       glob.glob(os.path.join(src_dir, "*.txt"))):
        for rec in read_jsonl(path, limit=limit):
            rows.append(
                {
                    "article_id": rec.get("article_id", ""),
                    "abstract": " ".join(rec.get("abstract_text", []))
                    if "abstract_text" in rec
                    else rec.get("abstract", ""),
                    "article": " ".join(rec.get("article_text", []))
                    if "article_text" in rec
                    else rec.get("article", ""),
                    "section_names": rec.get("section_names", []),
                }
            )
    df = pd.DataFrame(rows)
    if out_path.endswith(".parquet"):
        df.to_parquet(out_path)
    else:
        import pyarrow as pa
        import pyarrow.feather as feather

        feather.write_feather(pa.Table.from_pandas(df), out_path)
    return len(df)


def build_openalex_abstracts(
    snapshot_dir: str, out_path: str, *, limit: int | None = None
) -> int:
    """OpenAlex works snapshot (gzipped JSONL) → parquet of
    (id, title, abstract) — abstracts stored as inverted indexes are
    reconstructed (reference stub at data_utils.py:56-73)."""
    rows = []
    for path in sorted(
        glob.glob(os.path.join(snapshot_dir, "**", "*.gz"), recursive=True)
    ):
        for rec in read_jsonl(path, limit=limit):
            inv = rec.get("abstract_inverted_index")
            if not inv:
                continue
            n = max(p for positions in inv.values() for p in positions) + 1
            words = [""] * n
            for w, positions in inv.items():
                for p in positions:
                    words[p] = w
            rows.append(
                {
                    "id": rec.get("id", ""),
                    "title": rec.get("title", ""),
                    "abstract": " ".join(words),
                }
            )
    df = pd.DataFrame(rows)
    df.to_parquet(out_path)
    return len(df)
