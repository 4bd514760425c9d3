"""Exact-substring duplicate-span mining over a document corpus.

The training-data dedup measure of Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499): a span
is an n-word window; a span is DUPLICATED when its exact word sequence
occurs in at least two distinct documents.  The per-document output
(total spans, duplicated spans, ratio) is the removal/weighting signal
a curation pipeline thresholds on.

Shape, Ray-Data-first (no driver state at any size):

1. ``map_batches`` emit: per doc, one row per DISTINCT gram with its
   within-doc occurrence count (the map-side combine — a doc's grams
   never leave the batch un-aggregated).
2. ONE hash exchange: ``repartition(keys=["gram"])`` co-locates each
   gram's rows, then a vectorized per-block kernel flags rows whose
   gram appears in >= 2 rows of the block (rows are unique per
   (gram, doc), so the block-local row count IS the distinct doc
   count) and emits per-row (doc_id, n_spans=occ, dup_spans=occ|0)
   partials in the same pass — the gram stream crosses the wire
   exactly once (the earlier groupby+join plan shuffled it twice).
3. One ``groupby(doc_id)`` over those partials unioned with a zero
   row per doc (so gram-less docs stay in the output) → sums → ratio.

No join and no outer join are needed: the zero-row union plays the
COALESCE role, which keeps every exchange a repartition/groupby the
hash shuffle already handles (see stages/dedup.py's sentinel notes
for why outer joins on possibly-empty aggregates are fragile in
Ray 2.49).

Shuffle payload: the gram string (default) is ~6 bytes/word; pass
``key="hash64"`` to shuffle an 8-byte blake2b key instead — collisions
(~n_grams²/2⁶⁵) merge two spans' doc sets, overcounting duplication
with probability ~1e-9 at 10⁹ distinct grams; the default stays exact
for the oracle gate.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow as pa

from ..functions.quality import _WORD_RE


def _gram_hash64(gram: str) -> int:
    h = hashlib.blake2b(gram.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big", signed=True)


def dup_span_stats(ds, n: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", key: str = "gram",
                   num_partitions: int | None = None):
    """Per-doc duplicate-span stats: ``(doc_id, n_spans, dup_spans,
    dup_span_ratio)`` with ``dup_span_ratio`` rounded to 6 decimals.

    Every doc of the input appears exactly once; docs with fewer than
    ``n`` words report ``(0, 0, 0.0)``.  Words are the SQL-parity
    tokenizer (``[a-z0-9]+`` over lower(text)).
    """
    from ray.data.aggregate import Sum

    from .dedup import default_join_partitions

    if key not in ("gram", "hash64"):
        raise ValueError(f"key must be 'gram' or 'hash64', got {key!r}")
    nparts = num_partitions or default_join_partitions()
    key_type = pa.string() if key == "gram" else pa.int64()

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_key, out_id, out_occ = [], [], []
        for did, text in zip(ids, texts):
            words = _WORD_RE.findall(text.lower())
            if len(words) < n:
                continue
            occs = Counter(
                " ".join(words[i:i + n])
                for i in range(len(words) - n + 1))
            for gram, c in occs.items():
                out_key.append(gram if key == "gram"
                               else _gram_hash64(gram))
                out_id.append(did)
                out_occ.append(c)
        return pa.table({
            "gram": pa.array(out_key, key_type),
            id_col: pa.array(out_id, pa.int64()),
            "occ": pa.array(out_occ, pa.int64()),
        })

    import numpy as np
    import ray.data as rd

    from .dedup import hash_shuffle_context

    grams = ds.map_batches(emit, batch_format="pyarrow")

    def flag_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema([
                (id_col, pa.int64()), ("n_spans", pa.int64()),
                ("dup_spans", pa.int64())]).empty_table()
        if key == "gram":
            garr = np.asarray(batch["gram"].to_pylist(), dtype=object)
        else:
            garr = batch["gram"].to_numpy(zero_copy_only=False)
        order = np.argsort(garr, kind="stable")
        garr = garr[order]
        occ = batch["occ"].to_numpy(zero_copy_only=False)[order]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[order]
        change = np.ones(len(garr), dtype=bool)
        change[1:] = garr[1:] != garr[:-1]
        gid = np.cumsum(change) - 1
        rows_per_gram = np.bincount(gid)
        dup = rows_per_gram[gid] >= 2
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_spans": pa.array(occ, pa.int64()),
            "dup_spans": pa.array(np.where(dup, occ, 0), pa.int64()),
        })

    def zero_rows(batch: pa.Table) -> pa.Table:
        zero = pa.nulls(len(batch), pa.int64()).fill_null(0)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_spans": zero,
            "dup_spans": zero,
        })

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_spans = batch["n_spans"].cast(pa.int64())
        dup = batch["dup_spans"].cast(pa.int64())
        denom = pc.max_element_wise(n_spans, 1)  # guard 0-span docs
        ratio = pc.round(
            pc.divide(dup.cast(pa.float64()), denom.cast(pa.float64())),
            6)
        return pa.table({
            id_col: batch[id_col],
            "n_spans": n_spans,
            "dup_spans": dup,
            "dup_span_ratio": ratio,
        })

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_spans", pa.int64()),
        ("dup_spans", pa.int64()), ("dup_span_ratio", pa.float64()),
    ])

    # ONE exchange: co-locate each gram's rows (flag_block then marks
    # duplication block-locally); the planner resolves shuffle strategy
    # from the FINAL dataset's context snapshot, so the whole chain —
    # through the trailing typed-empty union (an empty corpus otherwise
    # yields a schema-less zero-column groupby result) — builds under
    # HASH_SHUFFLE (same pattern as joins.interval_join_bucketed)
    with hash_shuffle_context():
        shuffled = grams.repartition(nparts, keys=["gram"], sort=False)
        partials = (
            shuffled.map_batches(flag_block, batch_size=None,
                                 batch_format="pyarrow")
            .union(ds.select_columns([id_col])
                   .map_batches(zero_rows, batch_format="pyarrow"))
        )
        # num_partitions matters: the hash groupby otherwise spawns
        # default_hash_shuffle_parallelism (200!) aggregators
        summed = partials.groupby(id_col, num_partitions=nparts) \
            .aggregate(Sum("n_spans", alias_name="n_spans"),
                       Sum("dup_spans", alias_name="dup_spans"))
        return rd.from_arrow(out_schema.empty_table()).union(
            summed.map_batches(finish, batch_format="pyarrow"))
