"""Deterministic global shuffle export (VERDICT r4 #7) — the
training-order randomization step of an LLM data pipeline, without
RNG state: the shuffled order is the total order ``(knuth_hash(id),
id)``, a pure function of the row ids, so it is reproducible across
cluster sizes, resumable, and SQL-gateable (``ORDER BY hash``).

Layout contract:

- shard of a row = hash-RANGE bucket ``(h * S) >> 32`` over the
  32-bit hash space, so shards are contiguous hash ranges and
  reading shards in shard order, rows in file order, IS the global
  shuffled order (rows tying on ``h`` share a shard by construction,
  so the ``id`` tie-break never crosses a shard boundary);
- one directory per shard (``shard=K/part.parquet`` + ``_SUCCESS``
  marker) — the resumable-output rule: a failed run re-runs ONLY the
  shards without markers, because shard membership is a pure
  function of the id (never of block layout or task order);
- within a shard, rows are sorted by ``(h, id)`` in one in-memory
  block kernel — size ``num_shards`` so a shard fits a worker
  (the same bound every range-partitioned sort obeys).

The export is ONE hash exchange (co-locate shards) + a per-block
sort; no global sort, no RNG, no driver materialization.  Read-back
verification at toy scale walks shard dirs on the driver; at 10^12
rows the fingerprint becomes a per-shard hash combined
associatively — same invariant, no driver list.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .sampling import KNUTH_MULT

_HASH_SPACE = np.uint64(1) << np.uint64(32)


def knuth_hash(ids: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit Knuth multiplicative hash (uint64-safe for
    id < 2^32, the synth generator's contract)."""
    return (ids.astype(np.uint64) * np.uint64(KNUTH_MULT)) \
        % _HASH_SPACE


def shard_of(ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Hash-RANGE shard: contiguous buckets of the 32-bit hash
    space, so shard-major order preserves the global (h, id) order."""
    return ((knuth_hash(ids) * np.uint64(num_shards))
            >> np.uint64(32)).astype(np.int64)


def _finished_shards(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for d in os.listdir(out_dir):
        if d.startswith("shard=") and os.path.exists(
                os.path.join(out_dir, d, "_SUCCESS")):
            done.add(int(d.split("=", 1)[1]))
    return done


def shuffle_export(ds, out_dir: str, id_col: str = "doc_id",
                   num_shards: int = 8, resume: bool = False,
                   num_partitions: int | None = None) -> dict:
    """Write ``ds`` to ``out_dir`` in deterministic shuffled order.

    Returns ``{"n_rows": int, "n_shards": int, "skipped_shards":
    int}`` (counts of rows written this run / non-empty shard dirs /
    shards skipped because ``resume=True`` found their markers)."""
    from ray.data.aggregate import Sum

    from .windows import keyed_blocks

    os.makedirs(out_dir, exist_ok=True)
    done = _finished_shards(out_dir) if resume else set()

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        shard = shard_of(ids, num_shards)
        keep = ~np.isin(shard, list(done)) if done \
            else np.ones(len(shard), dtype=bool)
        return batch.append_column(
            "__shard", pa.array(shard, pa.int64())) \
            .filter(pa.array(keep))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def write_block(batch: pa.Table) -> pa.Table:
        # the exchange co-located every row of each shard here; one
        # vectorized (shard, h, id) lexsort, then one file per shard
        out_schema = pa.schema([("shard", pa.int64()),
                                ("n_rows", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = knuth_hash(ids)
        shard = batch["__shard"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, shard))
        tab = batch.take(pa.array(order)).drop_columns(["__shard"])
        shard_s = shard[order]
        starts = np.flatnonzero(
            np.r_[True, shard_s[1:] != shard_s[:-1]])
        ends = np.r_[starts[1:], len(shard_s)]
        out_shard, out_n = [], []
        for s, e in zip(starts, ends):
            sid = int(shard_s[s])
            d = os.path.join(out_dir, f"shard={sid}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(tab.slice(s, e - s),
                           os.path.join(d, "part.parquet"))
            with open(os.path.join(d, "_SUCCESS"), "w") as f:
                f.write("")
            out_shard.append(sid)
            out_n.append(int(e - s))
        return pa.table({"shard": pa.array(out_shard, pa.int64()),
                         "n_rows": pa.array(out_n, pa.int64())})

    manifest = keyed_blocks(tagged, ["__shard"],
                            num_partitions=num_partitions) \
        .map_batches(write_block, batch_size=None,
                     batch_format="pyarrow") \
        .groupby("shard").aggregate(Sum("n_rows", alias_name="n")) \
        .to_pandas()  # O(shards), not O(rows)
    return {
        "n_rows": int(manifest["n"].sum()) if len(manifest) else 0,
        "n_shards": len(_finished_shards(out_dir)),
        "skipped_shards": len(done),
    }


def read_shuffled_ids(out_dir: str, id_col: str = "doc_id") -> list:
    """Read the export back in its deterministic order (shard-major,
    file order) — toy-scale verification helper; see module
    docstring for the distributed-fingerprint form."""
    out: list = []
    shards = sorted(
        (int(d.split("=", 1)[1]) for d in os.listdir(out_dir)
         if d.startswith("shard=")))
    for sid in shards:
        path = os.path.join(out_dir, f"shard={sid}", "part.parquet")
        out.extend(pq.read_table(path, columns=[id_col])
                   [id_col].to_pylist())
    return out
