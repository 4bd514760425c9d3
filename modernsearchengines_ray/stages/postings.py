"""Shard construction — the reduce side of the index-build exchange.

Each shard task receives every posting *run* of its ``shard =
hash(term) % S`` (stages/spill.py routes them), so document frequency
computed inside the task IS global df — no second exchange.  Runs are
map-side combined per (batch, term) by the tokenize stage, so the
exchange moves ~vocab-sized rows per batch instead of per-posting rows.

Segmented posting layout: a term's posting list is stored as the
CONCATENATION of its runs (each already sorted by doc_id), never
re-sorted into one global doc order.  ``seg_lens`` records the segment
boundaries; doc_ids are delta+varint encoded with a reset at each
segment (functions/varint.encode_grouped_deltas_np).  Rationale:

- a global doc-order merge is a byte gather over the position blobs —
  memory-bandwidth-bound and pathological for hot (stopword-ish) terms
  (measured 4x per-task slowdown at full parallelism on one node);
  concatenation touches each byte once,
- BM25 accumulation at query time is doc-order-free, and block-max
  WAND upper bounds hold per segment-block exactly as per global
  block (a segment is just one more sorted posting list of the same
  term — standard multi-list disjunctive WAND),
- segments are the salt unit for skew (SURVEY.md §4): a pathological
  term's merge work can be split across sub-tasks that each emit
  complete segments, with no format change.

The task:

1. stable-sorts its runs by term (file order preserved within a term
   — deterministic given the deterministic run-file naming),
2. per term: df = total docs over runs; prune df <= 5
   (reference indexing.py:236-237); idf = log((N-df+0.5)/(df+0.5)+1);
   per-posting BM25 (k=1.5, b=0.75, token-count doc_len over char-avg
   denominator — the reference quirk, indexing.py:162-171,197,208),
3. packs each term into ONE row: segmented delta+varint doc_ids,
   varint tf counts, raw float64 scores (lossless — rank identity),
   concatenated per-doc delta+varint positions, per-segment-block
   max-score metadata (block-max WAND),
4. writes ``shard=<k>.parquet`` atomically and its manifest entry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.varint import encode_grouped_deltas_np, encode_varints_np

SHARD_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("idf", pa.float64()),
    ("min_bm25", pa.float64()),
    ("max_bm25", pa.float64()),
    ("seg_lens", pa.list_(pa.int32())),  # docs per sorted segment
    ("doc_ids", pa.binary()),       # delta + varint, reset per segment
    ("counts", pa.binary()),        # varint tf (= positions per doc)
    ("bm25", pa.binary()),          # raw little-endian float64
    ("positions", pa.binary()),     # per-doc delta + varint, concatenated
    ("block_first_doc", pa.list_(pa.int64())),
    ("block_max_bm25", pa.list_(pa.float64())),
])


def _empty_shard_table() -> pa.Table:
    return pa.table(
        {name: pa.array([], SHARD_SCHEMA.field(name).type)
         for name in SHARD_SCHEMA.names},
        schema=SHARD_SCHEMA,
    )


def _flat(column: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(values, offsets) of a single-chunk list column."""
    arr = column
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    return (
        arr.values.to_numpy(zero_copy_only=False),
        arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
    )


def build_shard_table(
    group: pa.Table,
    num_documents: int,
    avg_doc_len: float,
    cfg: IndexConfig,
    raw: bool = False,
) -> tuple[pa.Table, int]:
    """Merge one shard's posting runs into per-term rows.

    ``raw=True`` is the salted two-level merge's LEVEL-1 mode: scores
    stay idf-less (idf = 1, since df is only locally known), nothing is
    pruned, and ``df`` holds the partial doc count — finalize_shard_table
    sums dfs, applies idf and the prune.  BM25 is idf x raw with raw
    computed first in both modes, so two-level output is bit-identical
    to single-level.

    Returns (table, n_postings)."""
    if group.num_rows == 0:
        return _empty_shard_table(), 0
    group = group.combine_chunks()
    order = pa.compute.sort_indices(group, sort_keys=[("term", "ascending")])
    group = group.take(order).combine_chunks()

    terms = np.asarray(group["term"].to_pylist(), dtype=object)
    id_values, id_offsets = _flat(group["doc_ids"])
    tf_values, _ = _flat(group["tfs"])
    dl_values, _ = _flat(group["doc_lens"])
    blobs: list[bytes] = group["positions"].to_pylist()

    uniq_terms, starts = np.unique(terms, return_index=True)
    row_ends = np.append(starts[1:], len(terms))

    # whole-shard vectorized BM25 (reference formula verbatim incl. the
    # chars/tokens length-norm quirk)
    k1, b = cfg.k1, cfg.b
    tf_all = tf_values.astype(np.float64)
    norm_all = dl_values.astype(np.float64) / avg_doc_len
    denom_all = tf_all + k1 * (1.0 - b + b * norm_all)
    raw_all = (tf_all * (k1 + 1.0)) / denom_all   # idf applied per term

    cols: dict[str, list] = {name: [] for name in SHARD_SCHEMA.names}
    n_postings = 0
    bs = cfg.block_size

    for term, r0, r1 in zip(uniq_terms, starts, row_ends):
        v0, v1 = id_offsets[r0], id_offsets[r1]
        df = int(v1 - v0)
        if not raw and df <= cfg.min_df_exclusive:
            continue
        n_postings += df

        seg_lens = (id_offsets[r0 + 1 : r1 + 1] - id_offsets[r0:r1])
        seg_starts = np.concatenate(([0], np.cumsum(seg_lens[:-1])))
        doc_ids = id_values[v0:v1]
        tf = tf_values[v0:v1].astype(np.int64)

        if raw:
            idf = 1.0
            scores = raw_all[v0:v1]
        else:
            idf = float(np.log((num_documents - df + 0.5) / (df + 0.5) + 1.0))
            scores = idf * raw_all[v0:v1]

        # per-segment blocks: first doc id + max score upper bound
        block_first: list[int] = []
        block_max: list[float] = []
        for s0, sl in zip(seg_starts, seg_lens):
            n_blocks = (int(sl) + bs - 1) // bs
            for j in range(n_blocks):
                lo = int(s0) + j * bs
                hi = min(int(s0) + int(sl), lo + bs)
                block_first.append(int(doc_ids[lo]))
                block_max.append(float(scores[lo:hi].max()))

        cols["term"].append(str(term))
        cols["df"].append(df)
        cols["idf"].append(idf)
        cols["min_bm25"].append(float(scores.min()))
        cols["max_bm25"].append(float(scores.max()))
        cols["seg_lens"].append([int(x) for x in seg_lens])
        cols["doc_ids"].append(encode_grouped_deltas_np(doc_ids, seg_starts))
        cols["counts"].append(encode_varints_np(tf))
        cols["bm25"].append(scores.astype("<f8").tobytes())
        cols["positions"].append(b"".join(blobs[r0:r1]))
        cols["block_first_doc"].append(block_first)
        cols["block_max_bm25"].append(block_max)

    table = pa.table(
        {name: pa.array(cols[name], SHARD_SCHEMA.field(name).type)
         for name in SHARD_SCHEMA.names},
        schema=SHARD_SCHEMA,
    )
    return table, n_postings


def finalize_shard_table(
    partials: list[pa.Table],
    num_documents: int,
    cfg: IndexConfig,
) -> tuple[pa.Table, int]:
    """LEVEL 2 of the salted two-level merge: combine per-slice partial
    tables (each produced by ``build_shard_table(raw=True)`` over a
    contiguous slice of the run files) into the final shard.

    Per term: df = Σ partial dfs -> prune -> idf; raw score buffers are
    scaled by idf (idf x max(raw) == max(idf x raw) bit-for-bit for
    positive idf, so block-max metadata just scales); segment columns
    concatenate in slice order, which equals the single-level file
    order — output is bit-identical to a single-level merge.

    Arrow-native (VERDICT r2 #8): rows sort by term via one stable
    ``take`` (slice order preserved within a term), and each term's
    blob columns concatenate as direct BUFFER slices — a group's rows
    are contiguous after the sort, so the join is one memcpy per term,
    never a per-row Python round-trip of position/bm25 blobs."""
    live = [t for t in partials if t.num_rows > 0]
    if not live:
        empty = pa.table(
            {name: pa.array([], SHARD_SCHEMA.field(name).type)
             for name in SHARD_SCHEMA.names},
            schema=SHARD_SCHEMA)
        return empty, 0
    big = pa.concat_tables(live)
    terms = np.asarray(big.column("term").to_pylist(), dtype=object)
    order = np.argsort(terms, kind="stable")
    big = big.take(pa.array(order, pa.int64())).combine_chunks()
    terms = terms[order]
    n = len(terms)
    group_new = np.concatenate(([True], terms[1:] != terms[:-1]))
    starts = np.flatnonzero(group_new)
    ends = np.append(starts[1:], n)
    dfs = np.add.reduceat(
        big.column("df").to_numpy(zero_copy_only=False), starts)
    mins = np.minimum.reduceat(
        big.column("min_bm25").to_numpy(zero_copy_only=False), starts)
    maxs = np.maximum.reduceat(
        big.column("max_bm25").to_numpy(zero_copy_only=False), starts)
    keep_idx = np.flatnonzero(dfs > cfg.min_df_exclusive)

    def _bin(name):
        """(normalized offsets, memoryview) of a binary column."""
        arr = big.column(name).combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1]
        return offs, memoryview(arr.buffers()[2])

    def _lst(name):
        """(offsets rebased to the flattened values, values) of a
        list column."""
        arr = big.column(name).combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        return offs - offs[0], arr.flatten()

    docid_offs, docid_mv = _bin("doc_ids")
    count_offs, count_mv = _bin("counts")
    bm25_offs, bm25_mv = _bin("bm25")
    pos_offs, pos_mv = _bin("positions")
    seg_offs, seg_flat = _lst("seg_lens")
    bfd_offs, bfd_flat = _lst("block_first_doc")
    bmx_offs, bmx_flat = _lst("block_max_bm25")
    bmx_np = bmx_flat.to_numpy(zero_copy_only=False)

    cols: dict[str, list] = {name: [] for name in SHARD_SCHEMA.names}
    n_postings = 0
    for gi in keep_idx:
        s, e = int(starts[gi]), int(ends[gi])
        df = int(dfs[gi])
        n_postings += df
        idf = float(np.log((num_documents - df + 0.5) / (df + 0.5) + 1.0))
        scaled = idf * np.frombuffer(
            bm25_mv[bm25_offs[s]:bm25_offs[e]], dtype="<f8")

        cols["term"].append(terms[s])
        cols["df"].append(df)
        cols["idf"].append(idf)
        cols["min_bm25"].append(idf * float(mins[gi]))
        cols["max_bm25"].append(idf * float(maxs[gi]))
        cols["seg_lens"].append(
            seg_flat[seg_offs[s]:seg_offs[e]].to_pylist())
        cols["doc_ids"].append(bytes(docid_mv[docid_offs[s]:docid_offs[e]]))
        cols["counts"].append(bytes(count_mv[count_offs[s]:count_offs[e]]))
        cols["bm25"].append(scaled.astype("<f8").tobytes())
        cols["positions"].append(bytes(pos_mv[pos_offs[s]:pos_offs[e]]))
        cols["block_first_doc"].append(
            bfd_flat[bfd_offs[s]:bfd_offs[e]].to_pylist())
        cols["block_max_bm25"].append(
            (idf * bmx_np[bmx_offs[s]:bmx_offs[e]]).tolist())

    table = pa.table(
        {name: pa.array(cols[name], SHARD_SCHEMA.field(name).type)
         for name in SHARD_SCHEMA.names},
        schema=SHARD_SCHEMA,
    )
    return table, n_postings
