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
2. ``groupby(gram).count()`` → docs-per-gram; ``>= 2`` = duplicated
   grams (rows are unique per (gram, doc), so count(*) IS the distinct
   doc count).
3. Inner hash join emit × dup-grams → the duplicated occurrences.
4. One ``groupby(doc_id)`` over the UNION of three narrow partial
   streams (total occurrences / duplicated occurrences / a zero row
   per doc so gram-less docs stay in the output) → sums → ratio.

No outer join is needed: the zero-row union plays the COALESCE role,
which keeps every exchange an inner-join/groupby the hash shuffle
already handles (see stages/dedup.py's sentinel notes for why outer
joins on possibly-empty aggregates are fragile in Ray 2.49).

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
    from ray.data.aggregate import Count, Sum

    from .dedup import (_sentinel_table, default_join_partitions,
                        drop_sentinels, ensure_schema)

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

    # grams feeds THREE consumers (dup-key groupby, the join probe,
    # the totals partials) — materialize once or the lazy DAG
    # re-tokenizes the corpus per consumer; the gram table is
    # object-store-resident and spills, while recompute would be 3x
    # the pipeline's dominant CPU cost
    grams = ds.map_batches(emit, batch_format="pyarrow").materialize()

    # duplicated grams: present in >= 2 distinct docs
    dup_keys = (grams.groupby("gram")
                .aggregate(Count(alias_name="n_docs"))
                .filter(expr="n_docs >= 2")
                .select_columns(["gram"]))

    # a corpus can legitimately have NO duplicated grams (or no grams
    # at all): sentinel-guard both join sides against Ray's
    # empty-side Acero failure, then drop matched sentinels.  The
    # grams side is map_batches output (every block carries the emit
    # schema), so a plain sentinel UNION suffices — the full
    # ensure_schema would repartition the corpus-sized gram stream,
    # an extra all-to-all; only the groupby-produced dup_keys side
    # needs the schema-rebuilding repartition (and it is tiny).
    import ray.data as rd

    gram_schema = pa.schema([("gram", key_type),
                             (id_col, pa.int64()),
                             ("occ", pa.int64())])
    guarded_grams = rd.from_arrow(
        _sentinel_table(gram_schema)).union(grams)
    dup_occ = drop_sentinels(
        guarded_grams.join(
            ensure_schema(dup_keys, pa.schema([("gram", key_type)]),
                          num_blocks=nparts),
            "inner", num_partitions=nparts, on=("gram",)),
        "gram")

    def as_partial(dup: bool):
        def fn(batch: pa.Table) -> pa.Table:
            occ = batch["occ"]
            zero = pa.nulls(len(batch), pa.int64()).fill_null(0)
            return pa.table({
                id_col: batch[id_col],
                "n_spans": zero if dup else occ,
                "dup_spans": occ if dup else zero,
            })
        return fn

    def zero_rows(batch: pa.Table) -> pa.Table:
        zero = pa.nulls(len(batch), pa.int64()).fill_null(0)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_spans": zero,
            "dup_spans": zero,
        })

    partials = (
        grams.map_batches(as_partial(False), batch_format="pyarrow")
        .union(dup_occ.map_batches(as_partial(True),
                                   batch_format="pyarrow"))
        .union(ds.select_columns([id_col])
               .map_batches(zero_rows, batch_format="pyarrow"))
    )

    summed = partials.groupby(id_col).aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("dup_spans", alias_name="dup_spans"))

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

    # typed-empty union: an empty corpus otherwise yields a
    # schema-less zero-column result from the groupby
    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_spans", pa.int64()),
        ("dup_spans", pa.int64()), ("dup_span_ratio", pa.float64()),
    ])
    return rd.from_arrow(out_schema.empty_table()).union(
        summed.map_batches(finish, batch_format="pyarrow"))
