"""Dataset reconciliation — the table-diff / CDC primitive.

``dataset_diff(left, right, key, col)`` compares two keyed Datasets
and returns one row per differing key with a status:

- ``added``   — key present only in ``right`` (the "new" side)
- ``removed`` — key present only in ``left``
- ``changed`` — key in both, compared value differs

Scale shape: each side collapses to ``(key, fingerprint)`` in one
streaming map (md5 of the compared column, so only 16-byte digests
travel instead of payloads), then ONE full-outer hash join on the key
decides every status block-locally — no driver state, output rows ∝
actual differences.  Equality of md5 fingerprints stands in for value
equality (collision probability ~2^-64 at any realistic key count).

This is the anti-entropy pass a 100-TB corpus store runs between a
primary and a rebuilt/replicated copy before cutover, and the
incremental-ingest planner's "what actually changed" input.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _fingerprint(ds, key: str, col: str, side: str):
    def fp(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode() if isinstance(t, str)
                               else bytes(t)).hexdigest()
                   for t in batch[col].to_pylist()]
        return pa.table({key: batch[key],
                         f"fp_{side}": pa.array(digests, pa.string())})

    return ds.map_batches(fp, batch_format="pyarrow")


def dataset_diff(left, right, key: str, col: str,
                 num_partitions: int | None = None,
                 key_type: pa.DataType = pa.int64()):
    """Diff ``right`` (new) against ``left`` (old) on ``key``,
    comparing column ``col``; returns a Dataset ``(key, status)``
    containing ONLY differing keys.  ``key_type`` types the empty
    blocks a sparse shuffle partition can produce."""
    from .dedup import default_join_partitions

    nparts = num_partitions or default_join_partitions()
    out_schema = pa.schema([(key, key_type), ("status", pa.string())])
    lf = _fingerprint(left, key, col, "l")
    rf = _fingerprint(right, key, col, "r")
    joined = lf.join(rf, "full_outer", num_partitions=nparts,
                     on=(key,))

    def classify(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        fl, fr = batch["fp_l"], batch["fp_r"]
        added = pc.is_null(fl).to_numpy(zero_copy_only=False)
        removed = pc.is_null(fr).to_numpy(zero_copy_only=False)
        changed = pc.fill_null(pc.not_equal(fl, fr), False) \
            .to_numpy(zero_copy_only=False)
        status = np.where(added, "added",
                          np.where(removed, "removed", "changed"))
        keep = added | removed | changed
        return pa.table({
            key: batch[key].cast(key_type),
            "status": pa.array(status, pa.string()),
        }).filter(pa.array(keep))

    import ray.data as rd

    # typed-empty union: an all-equal diff otherwise surfaces as a
    # schema-less empty dataset (the repo-wide empty-block quirk)
    return rd.from_arrow(out_schema.empty_table()).union(
        joined.map_batches(classify, batch_format="pyarrow"))
