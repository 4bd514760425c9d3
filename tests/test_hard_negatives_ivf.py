"""Gates for stages/ann.py::hard_negatives_ivf — the IVF-bucketed
hard-negative tier.  Pins:

1. *tier parity at full probe* — nprobe=None equals the broadcast
   driver entry (q_hard_negatives) row-for-row on unseparated random
   data (the config the driver gate runs against the SQL oracle);
2. *planted-cluster recall* — with nprobe=1 on well-separated planted
   clusters whose cross-label negatives live in the SAME coarse cell,
   the approximate path still recovers the exact answer;
3. *no broadcast of the corpus matrix* — the only ``ray.put`` in the
   tier is the k x dim centroid table (source-level pin);
4. *degenerate labels* — single-label input yields a typed empty
   result instead of a -inf argmax row.
"""

from __future__ import annotations

import inspect

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.stages.ann import hard_negatives_ivf

_DIM = 8


def _table(ids, labels, mat) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
        "label": pa.array(np.asarray(labels, np.int64), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })


def _sf(tmp_path, tab):
    pq.write_table(tab, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _norm_sorted(df):
    df = df.sort_values("vec_id").reset_index(drop=True)
    return df[["vec_id", "neg_id", "cos_sim"]]


class TestHardNegativesIVF:
    def test_full_probe_matches_broadcast_tier(self, ray_session,
                                               tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.driver_queries import (
            q_hard_negatives)

        rng = np.random.default_rng(7)
        n = 80
        ids = np.arange(1, n + 1)
        labels = rng.integers(0, 3, size=n)
        mat = rng.normal(size=(n, _DIM))
        tab = _table(ids, labels, mat)

        sf = _sf(tmp_path, tab)
        want = _norm_sorted(q_hard_negatives(sf).to_pandas())
        got = _norm_sorted(
            hard_negatives_ivf(rd.from_arrow(tab), nprobe=None,
                               num_clusters=4).to_pandas())
        assert got["vec_id"].tolist() == want["vec_id"].tolist()
        assert got["neg_id"].tolist() == want["neg_id"].tolist()
        np.testing.assert_allclose(got["cos_sim"], want["cos_sim"],
                                   atol=1e-9)

    def test_planted_clusters_nprobe1(self, ray_session):
        import ray.data as rd

        # two tight clusters far apart; labels alternate WITHIN each
        # cluster so every vector's hard negative is a same-cluster
        # (same coarse cell) neighbor -> nprobe=1 stays exact
        rng = np.random.default_rng(11)
        centers = np.zeros((2, _DIM))
        centers[0, 0], centers[1, 1] = 100.0, 100.0
        rows, ids, labels = [], [], []
        k = 0
        for c in range(2):
            for i in range(12):
                k += 1
                ids.append(k)
                labels.append(i % 2)
                rows.append(centers[c] + 0.01 * rng.normal(size=_DIM))
        tab = _table(ids, np.asarray(labels), np.asarray(rows))

        exact = _norm_sorted(
            hard_negatives_ivf(rd.from_arrow(tab), nprobe=None,
                               num_clusters=2).to_pandas())
        approx = _norm_sorted(
            hard_negatives_ivf(rd.from_arrow(tab), nprobe=1,
                               num_clusters=2).to_pandas())
        assert approx["vec_id"].tolist() == exact["vec_id"].tolist()
        assert approx["neg_id"].tolist() == exact["neg_id"].tolist()

    def test_no_corpus_matrix_broadcast(self):
        src = inspect.getsource(hard_negatives_ivf)
        puts = [ln for ln in src.splitlines() if "ray.put" in ln]
        assert puts == ["    cent_ref = ray.put(centroids)"]

    def test_single_label_returns_typed_empty(self, ray_session):
        import ray.data as rd

        tab = _table([1, 2], np.asarray([3, 3]),
                     np.eye(2, _DIM))
        out = hard_negatives_ivf(rd.from_arrow(tab))
        assert out.count() == 0
        assert out.schema().names == ["vec_id", "neg_id", "cos_sim"]
