"""Corpus statistics stage (reference A5, with the A4 quirk preserved).

num_documents counts every corpus row; the char sum counts
``len(url_words + " " + text)`` only for docs at or under the 800k cap
(/root/reference/indexing.py:183,193-200: oversized docs are skipped
*before* the accumulation but the divisor is the full corpus size).

Implemented as map-side partials (one row per batch) + a tiny driver
reduce — no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..config import IndexConfig
from ..functions.textnorm import url_to_comma_separated_words


@dataclass(frozen=True)
class CorpusStats:
    num_documents: int
    avg_doc_len: float  # mean CHARS of indexed docs over ALL docs (the quirk)
    num_indexed: int


def _partials(batch: pa.Table, cfg: IndexConfig) -> pa.Table:
    has_url = cfg.prepend_url_words and "url" in batch.column_names
    if not has_url:
        # vectorized fast path: codepoint counts via Arrow kernels only
        lengths = pa.compute.utf8_length(batch["text"])
        mask = pa.compute.less_equal(lengths, cfg.max_doc_chars)
        kept = pa.compute.filter(lengths, mask)
        return pa.table({
            "count": pa.array([batch.num_rows], pa.int64()),
            "char_sum": pa.array(
                [pa.compute.sum(kept).as_py() or 0], pa.int64()
            ),
            "indexed": pa.array([len(kept)], pa.int64()),
        })
    texts = batch["text"].to_pylist()
    urls = batch["url"].to_pylist()
    count = len(texts)
    char_sum = 0
    indexed = 0
    for url, text in zip(urls, texts):
        if len(text) > cfg.max_doc_chars:
            continue
        if url:
            char_sum += len(url_to_comma_separated_words(url)) + 1 + len(text)
        else:
            char_sum += len(text)
        indexed += 1
    return pa.table({
        "count": pa.array([count], pa.int64()),
        "char_sum": pa.array([char_sum], pa.int64()),
        "indexed": pa.array([indexed], pa.int64()),
    })


def compute_corpus_stats(ds, cfg: IndexConfig) -> CorpusStats:
    partials = ds.map_batches(
        lambda b: _partials(b, cfg), batch_format="pyarrow"
    ).to_pandas()  # one row per input batch — tiny
    n = int(partials["count"].sum())
    char_sum = int(partials["char_sum"].sum())
    indexed = int(partials["indexed"].sum())
    return CorpusStats(
        num_documents=n,
        avg_doc_len=(char_sum / n) if n else 0.0,
        num_indexed=indexed,
    )
