"""Index compaction — merge each term's posting segments into one.

The segmented posting layout (stages/postings.py) appends one segment
per run file and never re-sorts at build time — the right write-path
trade (concatenation touches each byte once; BM25 accumulation is
doc-order-free).  But segments accumulate: every incremental
``update_index`` adds run files, and each extra segment costs WAND a
block whose ``block_first_doc`` ordering resets (functions/wand.py
treats each segment as its own sorted list), weakening upper-bound
pruning, plus per-segment decode overhead at serving time.

``compact_index`` is the Lucene-force-merge analogue: one independent
Ray task per shard decodes every term row, globally sorts its postings
by doc_id, re-encodes a SINGLE segment and recomputes the block-max
metadata over the sorted order.  Nothing about the scores changes —
df, idf and the per-posting BM25 float bit patterns are preserved, so
ranking is identical; only the physical layout (and WAND's pruning
power) improves.  Shards rewrite atomically and re-manifest under the
same fingerprint, so a crashed compaction leaves every shard either
old or new — both valid — and rerunning finishes the rest.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

from ..functions.varint import (
    decode_grouped_deltas_np,
    decode_varints_np,
    encode_grouped_deltas_np,
    encode_varints_np,
)
from ..stages.postings import SHARD_SCHEMA
from ..state.manifest import (
    ShardManifest,
    atomic_write_parquet,
    read_manifests,
    shard_path,
    write_shard_manifest,
)


def compact_shard_table(table: pa.Table, block_size: int) -> pa.Table:
    """Rewrite one shard table with a single sorted segment per term."""
    cols: dict[str, list] = {name: [] for name in SHARD_SCHEMA.names}
    for i in range(table.num_rows):
        seg_lens = np.asarray(table["seg_lens"][i].as_py(), dtype=np.int64)
        doc_ids = decode_grouped_deltas_np(
            table["doc_ids"][i].as_py(), seg_lens)
        counts = decode_varints_np(
            table["counts"][i].as_py()).astype(np.int64)
        scores = np.frombuffer(table["bm25"][i].as_py(), dtype="<f8")
        flat_pos = decode_grouped_deltas_np(
            table["positions"][i].as_py(), counts)

        perm = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[perm]
        sorted_counts = counts[perm]
        scores = scores[perm]
        # permute the per-doc position groups along with their docs
        pos_starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=pos_starts[1:])
        take = np.concatenate(
            [np.arange(pos_starts[j], pos_starts[j] + counts[j])
             for j in perm]) if len(counts) else np.empty(0, np.int64)
        flat_pos = flat_pos[take]
        new_starts = np.zeros(len(sorted_counts), dtype=np.int64)
        np.cumsum(sorted_counts[:-1], out=new_starts[1:])

        df = len(doc_ids)
        n_blocks = (df + block_size - 1) // block_size
        block_first, block_max = [], []
        for jb in range(n_blocks):
            lo, hi = jb * block_size, min(df, (jb + 1) * block_size)
            block_first.append(int(doc_ids[lo]))
            block_max.append(float(scores[lo:hi].max()))

        cols["term"].append(table["term"][i].as_py())
        cols["df"].append(int(table["df"][i].as_py()))
        cols["idf"].append(float(table["idf"][i].as_py()))
        cols["min_bm25"].append(float(table["min_bm25"][i].as_py()))
        cols["max_bm25"].append(float(table["max_bm25"][i].as_py()))
        cols["seg_lens"].append([df])
        cols["doc_ids"].append(
            encode_grouped_deltas_np(doc_ids, np.array([0])))
        cols["counts"].append(encode_varints_np(sorted_counts))
        cols["bm25"].append(scores.astype("<f8").tobytes())
        cols["positions"].append(
            encode_grouped_deltas_np(flat_pos, new_starts))
        cols["block_first_doc"].append(block_first)
        cols["block_max_bm25"].append(block_max)

    return pa.table(
        {name: pa.array(cols[name], SHARD_SCHEMA.field(name).type)
         for name in SHARD_SCHEMA.names},
        schema=SHARD_SCHEMA,
    )


def _compact_task(batch: pa.Table, index_dir: str, block_size: int,
                  row_group_size: int, fingerprint: str) -> pa.Table:
    import pyarrow.parquet as pq

    out = {"shard": [], "terms": [], "bytes": [], "wall_ms": []}
    for shard_id in batch["shard"].to_pylist():
        t0 = time.perf_counter()
        path = shard_path(index_dir, shard_id)
        old = pq.read_table(path)
        new = compact_shard_table(old, block_size)
        nbytes = atomic_write_parquet(new, path,
                                      row_group_size=row_group_size)
        n_postings = int(pa.compute.sum(new["df"]).as_py() or 0)
        write_shard_manifest(
            index_dir,
            ShardManifest(
                partition_id=shard_id,
                input_fingerprint=fingerprint,
                row_count=new.num_rows,
                postings_count=n_postings,
                bytes=nbytes,
                wall_ms=(time.perf_counter() - t0) * 1000.0,
            ),
        )
        out["shard"].append(shard_id)
        out["terms"].append(new.num_rows)
        out["bytes"].append(nbytes)
        out["wall_ms"].append((time.perf_counter() - t0) * 1000.0)
    return pa.table({
        "shard": pa.array(out["shard"], pa.int32()),
        "terms": pa.array(out["terms"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.int64()),
        "wall_ms": pa.array(out["wall_ms"], pa.float64()),
    })


def compact_index(index_dir: str) -> dict:
    """Compact every shard (one independent task per shard).

    Returns {"shards": n, "bytes": total} from the refreshed manifests.
    """
    import ray.data as rd

    from .build_index import read_meta

    meta = read_meta(index_dir)
    shard_ids = sorted(read_manifests(index_dir).keys())
    if shard_ids:
        summary = rd.from_items(
            [{"shard": k} for k in shard_ids],
            override_num_blocks=len(shard_ids),
        ).map_batches(
            _compact_task,
            batch_format="pyarrow",
            fn_kwargs={
                "index_dir": index_dir,
                "block_size": meta["block_size"],
                # honor the build's row-group granularity so lazy
                # serving (ShardScorer(lazy_shards=True)) keeps its
                # per-row-group read economics after a compaction
                "row_group_size": meta.get("shard_row_group_size"),
                "fingerprint": meta["fingerprint"],
            },
        ).to_pandas()
        assert len(summary) == len(shard_ids)
    manifests = read_manifests(index_dir)
    return {
        "shards": len(shard_ids),
        "bytes": sum(m.bytes for m in manifests.values()),
    }
