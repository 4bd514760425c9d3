"""Tokenize -> map-side posting construction (reference M14/A1, T1).

A stateful actor-pool stage: ``TokenizePostings`` is a callable class —
stem cache, compiled regexes and config live once per actor
(``__init__``); per batch it tokenizes each document and emits one row
per (term, doc) with the full position list, i.e. the A1 aggregation is
done entirely MAP-SIDE (documents never span batches), so the only wide
shuffle in index construction is the later groupby on the shard key.

Output schema per row:
  term: string, doc_id: int64, doc_len: int32 (token count of the doc —
  the BM25 length-norm numerator, indexing.py:207-208), tf: int32,
  positions: list<int32> (char offsets, restart per 800k chunk),
  shard: int32 (stable hash(term) % num_shards).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.hashing import term_shard
from ..functions.textnorm import url_to_comma_separated_words
from ..functions.tokenizer import tokenize

POSTING_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("doc_id", pa.int64()),
    ("doc_len", pa.int32()),
    ("tf", pa.int32()),
    ("positions", pa.list_(pa.int32())),
    ("shard", pa.int32()),
])


class TokenizePostings:
    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self._shard_cache: dict[str, int] = {}

    def _shard(self, term: str) -> int:
        s = self._shard_cache.get(term)
        if s is None:
            s = term_shard(term, self.cfg.num_shards)
            self._shard_cache[term] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        urls = (
            batch["url"].to_pylist()
            if "url" in batch.column_names
            else [""] * len(texts)
        )

        terms_out: list[str] = []
        docs_out: list[int] = []
        doclen_out: list[int] = []
        tf_out: list[int] = []
        pos_out: list[list[int]] = []
        shard_out: list[int] = []

        for doc_id, url, text in zip(doc_ids, urls, texts):
            if len(text) > cfg.max_doc_chars:
                continue  # skipped docs still count in stats (stats stage)
            if cfg.prepend_url_words and url:
                text = url_to_comma_separated_words(url) + " " + text
            tokens = tokenize(text, chunk_chars=cfg.chunk_chars)
            doc_len = len(tokens)
            per_term: dict[str, list[int]] = {}
            for term, position in tokens:
                per_term.setdefault(term, []).append(position)
            for term, positions in per_term.items():
                terms_out.append(term)
                docs_out.append(doc_id)
                doclen_out.append(doc_len)
                tf_out.append(len(positions))
                pos_out.append(positions)
                shard_out.append(self._shard(term))

        return pa.table(
            {
                "term": pa.array(terms_out, pa.string()),
                "doc_id": pa.array(docs_out, pa.int64()),
                "doc_len": pa.array(doclen_out, pa.int32()),
                "tf": pa.array(tf_out, pa.int32()),
                "positions": pa.array(pos_out, pa.list_(pa.int32())),
                "shard": pa.array(shard_out, pa.int32()),
            },
            schema=POSTING_SCHEMA,
        )


def tokenize_postings(ds, cfg: IndexConfig, concurrency=None, batch_size: int = 256,
                      num_cpus: float = 1.0):
    """corpus(doc_id, text[, url]) -> posting rows (the heavy CPU stage)."""
    if concurrency is None:
        import ray

        # actor pool sized to the session CPUs, leaving headroom for the
        # read and shuffle stages
        total = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, total - 2)
    return ds.map_batches(
        TokenizePostings,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_constructor_kwargs={"cfg": cfg},
        num_cpus=num_cpus,
        concurrency=concurrency,
    )
