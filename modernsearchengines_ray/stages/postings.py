"""Shard construction — the one wide shuffle of index build.

``groupby("shard")`` routes every posting of a term to exactly one
group (shard = stable hash(term) % S), so document frequency computed
inside the group IS global df — no second exchange.  The group task:

1. sorts its postings by (term, doc_id),
2. per term: df, idf = log((N-df+0.5)/(df+0.5)+1), per-posting BM25
   (k=1.5, b=0.75, token-count doc_len over char-avg denominator — the
   reference quirk, indexing.py:162-171,197,208),
3. prunes terms with df <= 5 (indexing.py:236-237),
4. packs each term into ONE row: delta+varint doc_ids, varint tf
   counts, raw float64 scores (lossless — rank identity), grouped
   delta+varint positions, and per-block max-score metadata
   (block-max WAND),
5. writes ``shard=<k>.parquet`` atomically and its manifest entry.

Skew note (SURVEY.md §4): hot stem groups are bounded by the df-prune
happening *after* the shuffle; the scale path for pathological terms is
salted sub-shards ``(term, hash(doc) % S)`` with a query-time merge —
the layout supports it (multiple rows per term concat at read).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.varint import (
    encode_deltas_np,
    encode_grouped_deltas_np,
    encode_varints_np,
)
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


def build_shard_table(
    group: pa.Table,
    num_documents: int,
    avg_doc_len: float,
    cfg: IndexConfig,
) -> tuple[pa.Table, int]:
    """Pack one shard's postings into per-term rows. Returns (table, n_postings)."""
    if group.num_rows == 0:
        return pa.table(
            {name: pa.array([], SHARD_SCHEMA.field(name).type)
             for name in SHARD_SCHEMA.names},
            schema=SHARD_SCHEMA,
        ), 0
    group = group.combine_chunks()
    order = pa.compute.sort_indices(
        group, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]
    )
    group = group.take(order).combine_chunks()

    terms = np.asarray(group["term"].to_pylist(), dtype=object)
    doc_ids = group["doc_id"].to_numpy()
    doc_lens = group["doc_len"].to_numpy().astype(np.float64)
    tfs = group["tf"].to_numpy().astype(np.float64)
    pos_arr = group["positions"]
    if isinstance(pos_arr, pa.ChunkedArray):
        pos_arr = pos_arr.chunk(0)
    pos_values = pos_arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    pos_offsets = pos_arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

    uniq_terms, starts = np.unique(terms, return_index=True)
    order_idx = np.argsort(starts)
    uniq_terms, starts = uniq_terms[order_idx], starts[order_idx]
    ends = np.append(starts[1:], len(terms))

    cols: dict[str, list] = {name: [] for name in SHARD_SCHEMA.names}
    n_postings = 0
    k1, b = cfg.k1, cfg.b

    for term, i0, i1 in zip(uniq_terms, starts, ends):
        df = int(i1 - i0)
        if df <= cfg.min_df_exclusive:
            continue
        n_postings += df
        idf = float(np.log((num_documents - df + 0.5) / (df + 0.5) + 1.0))
        tf = tfs[i0:i1]
        norm = doc_lens[i0:i1] / avg_doc_len
        scores = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * norm))
        term_docs = doc_ids[i0:i1]

        flat_positions = pos_values[pos_offsets[i0]:pos_offsets[i1]]
        row_starts = pos_offsets[i0:i1] - pos_offsets[i0]

        n_blocks = (df + cfg.block_size - 1) // cfg.block_size
        block_first = [int(term_docs[j * cfg.block_size]) for j in range(n_blocks)]
        block_max = [
            float(scores[j * cfg.block_size : (j + 1) * cfg.block_size].max())
            for j in range(n_blocks)
        ]

        cols["term"].append(str(term))
        cols["df"].append(df)
        cols["idf"].append(idf)
        cols["min_bm25"].append(float(scores.min()))
        cols["max_bm25"].append(float(scores.max()))
        cols["doc_ids"].append(encode_deltas_np(term_docs))
        cols["counts"].append(encode_varints_np(tf.astype(np.int64)))
        cols["bm25"].append(scores.astype("<f8").tobytes())
        cols["positions"].append(
            encode_grouped_deltas_np(flat_positions, row_starts)
        )
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
    """Group fn for ``postings.groupby('shard').map_groups(...)``: builds,
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
