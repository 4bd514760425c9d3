"""Tombstones — the delete ledger of an index directory.

The reference engine has no delete path at all (its crawler-side
upsert, WebCrawler_basis.py:246-252, happens before indexing); a
web-scale index needs one: pages get taken down, and a re-crawl of a
changed URL must supersede the old document.  The model here is
Lucene's live-docs two-phase delete:

  1. ``write_tombstones`` records doc_ids in
     ``<index_dir>/_tombstones/<batch_id>.parquet`` — an append-only
     ledger, atomic per batch, idempotent by batch_id.  Serving
     (pipelines/query.ShardScorer) filters tombstoned docs out of
     every decoded posting list, so deleted docs never surface;
     surviving docs keep their exact scores (global stats stay stale
     until purge, Lucene semantics).
  2. ``pipelines/delete.purge_deletes`` physically removes the docs
     (rewrites the spill runs, subtracts exact integer stats,
     re-merges every shard) and then clears the ledger — after which
     the index is LOGICALLY IDENTICAL to a from-scratch build over
     the remaining corpus.

The ledger is deliberately tiny and driver-readable: doc_ids only,
one parquet per delete batch.  At 10^12 docs the set that matters is
deletes-since-last-purge, which operationally stays small (purges run
on a schedule, like Lucene segment merges).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONES_DIR = "_tombstones"


def _dir(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONES_DIR)


def write_tombstones(index_dir: str, doc_ids, batch_id: str) -> int:
    """Append one delete batch; returns the number of ids recorded.

    Idempotent by ``batch_id`` (the file is overwritten atomically),
    so a retried delete job never double-records.
    """
    if not batch_id or "/" in batch_id:
        raise ValueError(f"batch_id must be a non-empty name: {batch_id!r}")
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    os.makedirs(_dir(index_dir), exist_ok=True)
    path = os.path.join(_dir(index_dir), f"{batch_id}.parquet")
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, path)
    return len(ids)


def read_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique int64 array of all tombstoned doc_ids (may be
    empty).  Sorted so membership tests are ``np.searchsorted``."""
    d = _dir(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            parts.append(
                pq.read_table(os.path.join(d, name))["doc_id"].to_numpy()
            )
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts).astype(np.int64))


def clear_tombstones(index_dir: str) -> None:
    """Drop the ledger (after a successful purge)."""
    d = _dir(index_dir)
    if not os.path.isdir(d):
        return
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            os.remove(os.path.join(d, name))


def is_deleted(doc_ids: np.ndarray, tombstones: np.ndarray) -> np.ndarray:
    """Vectorized membership: bool mask of ``doc_ids`` present in the
    SORTED ``tombstones`` array."""
    if not len(tombstones):
        return np.zeros(len(doc_ids), dtype=bool)
    pos = np.searchsorted(tombstones, doc_ids)
    pos[pos == len(tombstones)] = len(tombstones) - 1
    return tombstones[pos] == doc_ids
