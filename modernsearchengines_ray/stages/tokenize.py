"""Tokenize -> map-side posting-run construction (reference M14/A1, T1).

A stateful actor-pool stage: ``TokenizePostings`` is a callable class —
stem cache, compiled regexes and config live once per actor
(``__init__``); per batch it tokenizes each document and emits **one
row per (term) per batch** — a packed *posting run* — so the (term,
doc) aggregation (reference A1) happens entirely map-side and the one
wide shuffle moves runs, not individual postings (the combiner
pattern: shuffle row count drops by ~batch_size/vocab-ratio, which
under Zipf is orders of magnitude).

Run schema:
  term:      string
  shard:     int32         stable hash(term) % num_shards — shuffle key
  doc_ids:   list<int64>   docs of this batch containing the term
  tfs:       list<int32>   positions-per-doc (= tf)
  doc_lens:  list<int32>   token count per doc (BM25 length-norm
                           numerator, reference indexing.py:207-208)
  positions: binary        concat of per-doc delta+varint position
                           blobs, batch doc order
  pos_offsets: list<int32> byte offset of each doc's blob in positions

Per-doc position blobs are pre-compressed here because the runs are
about to cross the shuffle; the shard writer merge-sorts runs per term
by doc_id and permutes the blob segments without decoding them (the
on-disk grouped-delta format is exactly a concatenation of per-doc
delta streams).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import IndexConfig
from ..functions.hashing import term_shard
from ..functions.textnorm import url_to_comma_separated_words
from ..functions.tokenizer import tokenize

RUN_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("shard", pa.int32()),
    ("doc_ids", pa.list_(pa.int64())),
    ("tfs", pa.list_(pa.int32())),
    ("doc_lens", pa.list_(pa.int32())),
    ("positions", pa.binary()),
    ("pos_offsets", pa.list_(pa.int32())),
])


def _encode_positions(positions: list[int], out: bytearray) -> None:
    """Append the delta+varint stream of a (short, ascending) list.

    Pure-Python on purpose: per-posting lists are tiny (tf is 1-3 for
    most terms) and numpy per-call setup costs ~10x this loop; the numpy
    codecs serve the long per-term streams at decode time.
    """
    prev = 0
    for value in positions:
        delta = value - prev
        prev = value
        while True:
            byte = delta & 0x7F
            delta >>= 7
            if delta:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break


class _Run:
    __slots__ = ("doc_ids", "tfs", "doc_lens", "blob", "offsets")

    def __init__(self) -> None:
        self.doc_ids: list[int] = []
        self.tfs: list[int] = []
        self.doc_lens: list[int] = []
        self.blob = bytearray()
        self.offsets: list[int] = []


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

        runs: dict[str, _Run] = {}
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
                run = runs.get(term)
                if run is None:
                    run = runs[term] = _Run()
                run.doc_ids.append(doc_id)
                run.tfs.append(len(positions))
                run.doc_lens.append(doc_len)
                run.offsets.append(len(run.blob))
                _encode_positions(positions, run.blob)

        terms = sorted(runs)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "shard": pa.array(
                    [self._shard(t) for t in terms], pa.int32()
                ),
                "doc_ids": pa.array(
                    [runs[t].doc_ids for t in terms], pa.list_(pa.int64())
                ),
                "tfs": pa.array(
                    [runs[t].tfs for t in terms], pa.list_(pa.int32())
                ),
                "doc_lens": pa.array(
                    [runs[t].doc_lens for t in terms], pa.list_(pa.int32())
                ),
                "positions": pa.array(
                    [bytes(runs[t].blob) for t in terms], pa.binary()
                ),
                "pos_offsets": pa.array(
                    [runs[t].offsets for t in terms], pa.list_(pa.int32())
                ),
            },
            schema=RUN_SCHEMA,
        )


def tokenize_postings(ds, cfg: IndexConfig, concurrency=None,
                      batch_size: int = 256, num_cpus: float = 1.0):
    """corpus(doc_id, text[, url]) -> posting runs (the heavy CPU stage)."""
    if concurrency is None:
        import ray

        # autoscaling actor pool: small jobs pay for a few actor spawns,
        # big jobs scale to the session CPUs minus headroom for the read
        # and shuffle stages
        total = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (max(1, total // 4), max(1, total - 2))
    return ds.map_batches(
        TokenizePostings,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_constructor_kwargs={"cfg": cfg},
        num_cpus=num_cpus,
        concurrency=concurrency,
    )
