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
  doc_ids:   list<int64>   docs of this batch containing the term,
                           ASCENDING (the batch is sorted by doc_id)
  tfs:       list<int32>   positions-per-doc (= tf)
  doc_lens:  list<int32>   token count per doc (BM25 length-norm
                           numerator, reference indexing.py:207-208)
  positions: binary        concat of per-doc delta+varint position
                           blobs, run doc order

Per-doc position blobs are pre-compressed here because the runs are
about to cross the shuffle; each run row becomes one sorted SEGMENT of
its term's posting list in the shard (postings.py stores segments
concatenated, never re-sorted — a global doc-order merge would be a
bandwidth-bound byte gather for hot terms, and per-segment blocks give
the same WAND upper bounds).
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
])

#: per-doc corpus-stat contributions (spilled next to the runs so a
#: later purge can subtract a deleted doc's EXACT integer stats —
#: chars is 0 for over-cap skipped docs, which count only in
#: num_documents; see pipelines/delete.py)
DOCSTATS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("chars", pa.int64()),
    ("indexed", pa.int8()),
])


def _encode_positions(positions: list[int], out: bytearray) -> None:
    """Append the delta+varint stream of a (short, ascending) list.

    Pure-Python on purpose: per-posting lists are tiny (tf is 1-3 for
    most terms) and numpy per-call setup costs ~10x this loop — a
    batch-wide vectorized encode was tried and measured ~30% SLOWER
    end-to-end (list marshalling swamped the saved varint loops); the
    numpy codecs serve the long per-term streams at decode time.
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
    __slots__ = ("doc_ids", "tfs", "doc_lens", "blob")

    def __init__(self) -> None:
        self.doc_ids: list[int] = []
        self.tfs: list[int] = []
        self.doc_lens: list[int] = []
        self.blob = bytearray()


#: per-worker-process shard cache shared across task invocations
_SHARD_CACHE: dict[tuple[int, str], int] = {}


def _shard_of(term: str, num_shards: int) -> int:
    key = (num_shards, term)
    s = _SHARD_CACHE.get(key)
    if s is None:
        s = term_shard(term, num_shards)
        _SHARD_CACHE[key] = s
    return s


def build_runs(
    batch: pa.Table, cfg: IndexConfig
) -> tuple[pa.Table, tuple[int, int, int], pa.Table]:
    """One pass over a corpus batch: posting runs + corpus-stat partials.

    Returns ``(runs_table, (count, char_sum, indexed), docstats)`` —
    the stat partial replicates reference indexing.py:183,193-200:
    every row counts in ``count``; only docs at/under the char cap
    contribute ``len(url_words + " " + text)`` chars and count as
    indexed.  ``docstats`` (DOCSTATS_SCHEMA) carries the same sums
    per document, so deleting a doc later can subtract its exact
    integer contribution.
    """
    # ascending doc order => every run is a sorted posting-list segment
    batch = batch.sort_by([("doc_id", "ascending")])
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    urls = (
        batch["url"].to_pylist()
        if "url" in batch.column_names
        else [""] * len(texts)
    )

    char_sum = 0
    indexed = 0
    doc_chars: list[int] = []
    doc_indexed: list[int] = []
    runs: dict[str, _Run] = {}
    for doc_id, url, text in zip(doc_ids, urls, texts):
        if len(text) > cfg.max_doc_chars:
            doc_chars.append(0)  # counts in num_documents only
            doc_indexed.append(0)
            continue
        if cfg.prepend_url_words and url:
            text = url_to_comma_separated_words(url) + " " + text
        char_sum += len(text)
        indexed += 1
        doc_chars.append(len(text))
        doc_indexed.append(1)
        tokens = tokenize(text, chunk_chars=cfg.chunk_chars,
                          lemma_table=cfg.lemma_table)
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
            _encode_positions(positions, run.blob)

    terms = sorted(runs)
    table = pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "shard": pa.array(
                [_shard_of(t, cfg.num_shards) for t in terms], pa.int32()
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
        },
        schema=RUN_SCHEMA,
    )
    docstats = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chars": pa.array(doc_chars, pa.int64()),
            "indexed": pa.array(doc_indexed, pa.int8()),
        },
        schema=DOCSTATS_SCHEMA,
    )
    return table, (len(doc_ids), char_sum, indexed), docstats


class TokenizePostings:
    """Callable batch fn (kept for the runs-Dataset surface; the index
    build itself uses the spill stage, stages/spill.py)."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        table, _, _ = build_runs(batch, self.cfg)
        return table


def _tokenize_task(batch: pa.Table, cfg: IndexConfig) -> pa.Table:
    table, _, _ = build_runs(batch, cfg)
    return table


def tokenize_postings(ds, cfg: IndexConfig, concurrency=None,
                      batch_size: int = 256, num_cpus: float = 1.0):
    """corpus(doc_id, text[, url]) -> posting runs (the heavy CPU stage).

    Runs as a stateless task pool: tokenizer state is per-process module
    caches, so Ray's prestarted warm workers serve it with zero actor
    ramp-up (measured ~50% pool idle with an autoscaling actor pool on
    this stage — the state here is trivia, not a model load).
    """
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        _tokenize_task,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"cfg": cfg},
        num_cpus=num_cpus,
        **kwargs,
    )
