"""VERDICT r4 #7 gates for stages/shuffle_export.py: the deterministic
global shuffle export (training-order randomization with no RNG state).

Pins the three contract properties the module docstring promises:

1. *order law* — shard-major read-back is exactly the rows sorted by
   ``(knuth_hash(id), id)``, and every row lands in the hash-range
   shard ``(h * S) >> 32`` its id dictates;
2. *block-order invariance* — re-running the export from the same rows
   under a different block layout (different partition counts, reversed
   input order) reproduces the byte-identical shard files, because the
   order is a pure function of the ids;
3. *resume* — a run over a directory with surviving ``_SUCCESS``
   markers rewrites ONLY the unmarked shards and reports them in
   ``skipped_shards``; the resumed read-back equals the unbroken one.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.shuffle_export import (
    knuth_hash,
    read_shuffled_ids,
    shard_of,
    shuffle_export,
)

_N = 700
_SHARDS = 8


def _rows() -> pa.Table:
    ids = np.arange(1, _N + 1, dtype=np.int64)
    return pa.table({
        "doc_id": ids,
        "payload": pa.array([f"doc-{i}" for i in ids]),
    })


def _expected_order() -> list[int]:
    ids = np.arange(1, _N + 1, dtype=np.int64)
    h = knuth_hash(ids)
    return [int(i) for i in ids[np.lexsort((ids, h))]]


def _export(tmp_path, tab: pa.Table, sub: str, *, num_blocks: int,
            **kw) -> tuple[str, dict]:
    import ray

    out = str(tmp_path / sub)
    ds = ray.data.from_arrow(tab).repartition(num_blocks)
    stats = shuffle_export(ds, out, num_shards=_SHARDS, **kw)
    return out, stats


def test_order_law_and_shard_membership(ray_session, tmp_path):
    out, stats = _export(tmp_path, _rows(), "a", num_blocks=5)
    assert stats == {"n_rows": _N, "n_shards": _SHARDS,
                     "skipped_shards": 0}
    assert read_shuffled_ids(out) == _expected_order()
    # every row sits in the shard its id dictates, and shards are
    # contiguous hash ranges (max h of shard k < min h of shard k+1)
    import pyarrow.parquet as pq

    prev_max = -1
    for sid in range(_SHARDS):
        path = os.path.join(out, f"shard={sid}", "part.parquet")
        ids = pq.read_table(path, columns=["doc_id"])["doc_id"] \
            .to_numpy()
        assert (shard_of(ids, _SHARDS) == sid).all()
        h = knuth_hash(ids)
        assert int(h.min()) > prev_max
        prev_max = int(h.max())


def test_block_order_invariance(ray_session, tmp_path):
    tab = _rows()
    rev = tab.take(pa.array(np.arange(_N - 1, -1, -1)))
    out_a, _ = _export(tmp_path, tab, "a", num_blocks=3)
    out_b, _ = _export(tmp_path, rev, "b", num_blocks=11,
                       num_partitions=7)
    assert read_shuffled_ids(out_a) == read_shuffled_ids(out_b)
    for sid in range(_SHARDS):
        fa = os.path.join(out_a, f"shard={sid}", "part.parquet")
        fb = os.path.join(out_b, f"shard={sid}", "part.parquet")
        with open(fa, "rb") as f:
            ba = f.read()
        with open(fb, "rb") as f:
            bb = f.read()
        assert ba == bb, f"shard {sid} bytes differ across layouts"


def test_resume_rewrites_only_unmarked_shards(ray_session, tmp_path):
    out, _ = _export(tmp_path, _rows(), "a", num_blocks=4)
    want = read_shuffled_ids(out)
    # simulate a failed run: shards 2 and 5 never finished
    mtimes = {}
    for sid in (2, 5):
        shutil.rmtree(os.path.join(out, f"shard={sid}"))
    for sid in range(_SHARDS):
        p = os.path.join(out, f"shard={sid}", "part.parquet")
        if os.path.exists(p):
            mtimes[sid] = os.stat(p).st_mtime_ns
    import ray

    ds = ray.data.from_arrow(_rows()).repartition(4)
    stats = shuffle_export(ds, out, num_shards=_SHARDS, resume=True)
    assert stats["skipped_shards"] == _SHARDS - 2
    assert stats["n_shards"] == _SHARDS
    # only the two missing shards were written this run
    assert stats["n_rows"] == sum(
        1 for i in range(1, _N + 1)
        if int(shard_of(np.array([i]), _SHARDS)[0]) in (2, 5))
    for sid, old in mtimes.items():
        p = os.path.join(out, f"shard={sid}", "part.parquet")
        assert os.stat(p).st_mtime_ns == old, \
            f"finished shard {sid} was rewritten on resume"
    assert read_shuffled_ids(out) == want


def test_resume_false_overwrites_everything(ray_session, tmp_path):
    out, _ = _export(tmp_path, _rows(), "a", num_blocks=4)
    _, stats = _export(tmp_path, _rows(), "a", num_blocks=4)
    assert stats == {"n_rows": _N, "n_shards": _SHARDS,
                     "skipped_shards": 0}
    assert read_shuffled_ids(out) == _expected_order()
