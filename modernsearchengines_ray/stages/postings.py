"""Shard construction — the one wide shuffle of index build.

``groupby("shard")`` routes every posting *run* of a term to exactly
one group (shard = stable hash(term) % S), so document frequency
computed inside the group IS global df — no second exchange.  Runs are
map-side combined per (batch, term) by the tokenize stage, so the
shuffle moves ~vocab-sized rows per batch instead of per-posting rows.

The group task:

1. sorts its runs by term,
2. per term: merge-sorts the runs' doc arrays by doc_id (stable
   argsort; each doc occurs in exactly one run) and permutes the
   pre-encoded per-doc position blobs with a vectorized byte gather —
   no decode,
3. df, idf = log((N-df+0.5)/(df+0.5)+1), per-posting BM25 (k=1.5,
   b=0.75, token-count doc_len over char-avg denominator — the
   reference quirk, indexing.py:162-171,197,208),
4. prunes terms with df <= 5 (indexing.py:236-237),
5. packs each term into ONE row: delta+varint doc_ids, varint tf
   counts, raw float64 scores (lossless — rank identity), concatenated
   per-doc delta+varint positions, per-block max-score metadata
   (block-max WAND),
6. writes ``shard=<k>.parquet`` atomically and its manifest entry.

Skew note (SURVEY.md §4): hot stem groups are bounded by map-side
combining (one run per batch regardless of tf) and by the df-prune;
the residual scale path for pathological terms is salted sub-shards
``(term, hash(doc) % S)`` with a query-time merge — the layout
supports it (multiple rows per term concat at read).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.varint import encode_deltas_np, encode_varints_np
from ..state.manifest import (
    ShardManifest,
    atomic_write_parquet,
    shard_path,
    write_shard_manifest,
)

SHARD_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("idf", pa.float64()),
    ("min_bm25", pa.float64()),
    ("max_bm25", pa.float64()),
    ("doc_ids", pa.binary()),       # delta + varint
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
) -> tuple[pa.Table, int]:
    """Merge one shard's posting runs into per-term rows.

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
    po_values, po_offsets = _flat(group["pos_offsets"])
    blobs: list[bytes] = group["positions"].to_pylist()
    blob_lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                            count=len(blobs))

    uniq_terms, starts = np.unique(terms, return_index=True)
    row_ends = np.append(starts[1:], len(terms))

    cols: dict[str, list] = {name: [] for name in SHARD_SCHEMA.names}
    n_postings = 0
    k1, b = cfg.k1, cfg.b

    for term, r0, r1 in zip(uniq_terms, starts, row_ends):
        df = int(id_offsets[r1] - id_offsets[r0])
        if df <= cfg.min_df_exclusive:
            continue
        n_postings += df

        doc_ids = id_values[id_offsets[r0]:id_offsets[r1]]
        tf = tf_values[id_offsets[r0]:id_offsets[r1]].astype(np.float64)
        doc_len = dl_values[id_offsets[r0]:id_offsets[r1]].astype(np.float64)

        # per-doc blob segments across this term's runs
        seg_starts = po_values[po_offsets[r0]:po_offsets[r1]].astype(np.int64)
        seg_lens = np.empty(df, dtype=np.int64)
        run_sizes = id_offsets[r0 + 1 : r1 + 1] - id_offsets[r0:r1]
        cursor = 0
        blob_base = 0
        for r in range(r0, r1):
            size = int(run_sizes[r - r0])
            run_offs = seg_starts[cursor : cursor + size]
            seg_lens[cursor : cursor + size - 1] = np.diff(run_offs)
            seg_lens[cursor + size - 1] = blob_lens[r] - run_offs[-1]
            run_offs += blob_base
            blob_base += blob_lens[r]
            cursor += size
        term_blob = np.frombuffer(b"".join(blobs[r0:r1]), dtype=np.uint8)

        # global merge by doc_id (each doc occurs in exactly one run)
        sort_order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[sort_order]
        tf = tf[sort_order]
        doc_len = doc_len[sort_order]
        out_lens = seg_lens[sort_order]
        out_starts = np.zeros(df, dtype=np.int64)
        np.cumsum(out_lens[:-1], out=out_starts[1:])
        total = int(out_lens.sum())
        # vectorized byte gather: permute per-doc segments without decoding
        src = (
            np.repeat(seg_starts[sort_order], out_lens)
            + np.arange(total)
            - np.repeat(out_starts, out_lens)
        )
        positions_blob = term_blob[src].tobytes()

        idf = float(np.log((num_documents - df + 0.5) / (df + 0.5) + 1.0))
        norm = doc_len / avg_doc_len
        scores = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * norm))

        n_blocks = (df + cfg.block_size - 1) // cfg.block_size
        block_first = [int(doc_ids[j * cfg.block_size]) for j in range(n_blocks)]
        block_max = [
            float(scores[j * cfg.block_size : (j + 1) * cfg.block_size].max())
            for j in range(n_blocks)
        ]

        cols["term"].append(str(term))
        cols["df"].append(df)
        cols["idf"].append(idf)
        cols["min_bm25"].append(float(scores.min()))
        cols["max_bm25"].append(float(scores.max()))
        cols["doc_ids"].append(encode_deltas_np(doc_ids))
        cols["counts"].append(encode_varints_np(tf.astype(np.int64)))
        cols["bm25"].append(scores.astype("<f8").tobytes())
        cols["positions"].append(positions_blob)
        cols["block_first_doc"].append(block_first)
        cols["block_max_bm25"].append(block_max)

    table = pa.table(
        {name: pa.array(cols[name], SHARD_SCHEMA.field(name).type)
         for name in SHARD_SCHEMA.names},
        schema=SHARD_SCHEMA,
    )
    return table, n_postings


def make_shard_writer(
    index_dir: str,
    num_documents: int,
    avg_doc_len: float,
    cfg: IndexConfig,
    input_fingerprint: str,
):
    """Group fn for ``runs.groupby('shard').map_groups(...)``: builds,
    writes and manifests one shard; returns a one-row summary batch."""

    def write_shard(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        shard_id = int(group["shard"][0].as_py())
        table, n_postings = build_shard_table(
            group, num_documents, avg_doc_len, cfg
        )
        nbytes = atomic_write_parquet(table, shard_path(index_dir, shard_id))
        wall_ms = (time.perf_counter() - t0) * 1000.0
        write_shard_manifest(
            index_dir,
            ShardManifest(
                partition_id=shard_id,
                input_fingerprint=input_fingerprint,
                row_count=table.num_rows,
                postings_count=n_postings,
                bytes=nbytes,
                wall_ms=wall_ms,
            ),
        )
        return pa.table({
            "shard": pa.array([shard_id], pa.int32()),
            "terms": pa.array([table.num_rows], pa.int64()),
            "postings": pa.array([n_postings], pa.int64()),
            "bytes": pa.array([nbytes], pa.int64()),
            "wall_ms": pa.array([wall_ms], pa.float64()),
        })

    return write_shard
