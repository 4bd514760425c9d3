"""Hash-partitioned document store — the metadata/content side of serving.

The reference resolves ranked doc_ids back to (url, website, topics)
with per-row SQLite point lookups (retrieval.py:277-292, J2) and
fetches content per top-10 hit for snippets (retrieval.py:361-374,
J3).  Here the corpus is written once as hash(doc_id)-partitioned
parquet; a lookup for k hit ids reads ONLY the partitions those ids
hash into, with a parquet row filter — a broadcast-small-side
semi-join against shards, not a scan.

At 10^12 docs the same layout holds (more partitions); per-shard
actor caches (SURVEY.md §2.1 S6) drop in front of the reads when
serving latency matters.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.dataset as pads


def _partition_of(doc_id: int, num_partitions: int) -> int:
    # splitmix-style scramble so sequential ids spread uniformly
    h = (doc_id * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return int(h >> 32) % num_partitions


def write_docstore(corpus_ds, store_dir: str,
                   num_partitions: int = 32) -> str:
    """corpus -> ``store_dir/part=<p>/`` hive-partitioned parquet."""
    def add_part(batch: pa.Table) -> pa.Table:
        parts = [_partition_of(d, num_partitions)
                 for d in batch["doc_id"].to_pylist()]
        return batch.append_column("part", pa.array(parts, pa.int32()))

    corpus_ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["part"]
    )
    return store_dir


class DocStore:
    """Point/multi lookup over the partitioned store."""

    def __init__(self, store_dir: str, num_partitions: int = 32):
        self.store_dir = store_dir
        self.num_partitions = num_partitions
        self._dataset = pads.dataset(store_dir, partitioning="hive")

    def lookup(self, doc_ids: list[int],
               columns: list[str] | None = None) -> pa.Table:
        """Rows for ``doc_ids`` — reads only the owning partitions."""
        by_part: dict[int, list[int]] = defaultdict(list)
        for d in doc_ids:
            by_part[_partition_of(d, self.num_partitions)].append(d)
        if not by_part:
            return self._dataset.head(0)
        filt = (pads.field("part").isin(list(by_part)) &
                pads.field("doc_id").isin(doc_ids))
        cols = columns
        if cols is not None and "doc_id" not in cols:
            cols = ["doc_id", *cols]
        return self._dataset.to_table(columns=cols, filter=filt)

    def lookup_map(self, doc_ids: list[int],
                   columns: list[str]) -> dict[int, dict]:
        table = self.lookup(doc_ids, columns)
        rows = table.to_pylist()
        return {r["doc_id"]: r for r in rows}

    def facet_counts(self, field: str, doc_ids=None):
        """Distributed facet counting over a metadata column (Lucene
        facets analogue): docs-per-value of ``field``, optionally
        restricted to a match set.

        Scale shape: one streaming ``map_batches`` pass over the store
        emits per-batch ``value_counts`` PARTIALS (facet-cardinality
        rows, not doc rows), summed by a tiny groupby — the classic
        map-side combiner.  A match set (query hits) is broadcast once
        via ``ray.put`` and applied per batch with a vectorized
        ``np.isin``; at 10^12 docs the set of ids matching a query is
        the small side by construction.

        Returns a pandas DataFrame ``[field, count]`` sorted by
        (-count, value)."""
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc
        import ray
        import ray.data as rd
        from ray.data.aggregate import Sum

        if doc_ids is not None:
            ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
            if not ids.size:
                return pd.DataFrame({field: pd.Series([], dtype=object),
                                     "count": pd.Series([], dtype="int64")})
            ids_ref = ray.put(ids)
        else:
            ids_ref = None

        def partial(batch: pa.Table) -> pa.Table:
            vals = batch[field]
            if ids_ref is not None:
                mask = np.isin(batch["doc_id"].to_numpy(),
                               ray.get(ids_ref))
                vals = pc.filter(vals, pa.array(mask))
            vc = pc.value_counts(vals)
            return pa.table({field: vc.field("values"),
                             "n": vc.field("counts")})

        out = (
            rd.read_parquet(self.store_dir, columns=["doc_id", field])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(field)
            .aggregate(Sum("n", alias_name="count"))
            .to_pandas()
        )
        return out.sort_values(["count", field],
                               ascending=[False, True]).reset_index(drop=True)


def _drop_task(batch: pa.Table, store_dir: str, dead_ref) -> pa.Table:
    import glob

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .tombstones import is_deleted

    dead = ray.get(dead_ref) if hasattr(dead_ref, "hex") else dead_ref
    out = {"part": [], "dropped": []}
    for part in batch["part"].to_pylist():
        dropped = 0
        for path in sorted(
                glob.glob(os.path.join(store_dir, f"part={part}", "*"))):
            t = pq.read_table(path)
            mask = is_deleted(
                t["doc_id"].to_numpy().astype(np.int64), dead)
            if mask.any():
                kept = t.filter(pa.array(~mask))
                tmp = f"{path}.tmp.{os.getpid()}"
                pq.write_table(kept, tmp)
                os.replace(tmp, path)
                dropped += int(mask.sum())
        out["part"].append(part)
        out["dropped"].append(dropped)
    return pa.table({"part": pa.array(out["part"], pa.int32()),
                     "dropped": pa.array(out["dropped"], pa.int64())})


def compact_docstore(store_dir: str, doc_ids,
                     num_partitions: int = 32) -> int:
    """Physically drop documents from the store — the metadata-side
    companion of ``pipelines/delete.purge_deletes``.

    Partition-pruned: only the hash partitions owning the given ids
    are rewritten, one independent Ray task each (atomic per file, so
    a crashed run re-runs safely — dropping an absent id is a no-op).
    Tombstoned docs never rank, so running this lazily/batched is
    fine; it reclaims storage and keeps point lookups honest.

    Returns the number of rows dropped.
    """
    import numpy as np
    import ray
    import ray.data as rd

    from .tombstones import is_deleted  # noqa: F401 (task import path)

    dead = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if not len(dead):
        return 0
    parts = sorted({_partition_of(int(d), num_partitions) for d in dead})
    parts = [p for p in parts
             if os.path.isdir(os.path.join(store_dir, f"part={p}"))]
    if not parts:
        return 0
    summary = rd.from_items(
        [{"part": p} for p in parts], override_num_blocks=len(parts),
    ).map_batches(
        _drop_task,
        batch_format="pyarrow",
        fn_kwargs={"store_dir": store_dir, "dead_ref": ray.put(dead)},
    ).to_pandas()
    return int(summary["dropped"].sum())
