"""VERDICT r4 #8 gates for stages/ann.py::mutual_nn_ivf — the
IVF-bucketed mutual-NN tier.  Pins:

1. *exactness at full probe* — nprobe=None (probe every cluster)
   equals a brute-force numpy mutual-NN on unseparated random data
   (the config the driver gate runs against the SQL oracle);
2. *planted-cluster recall* — with nprobe=1 on well-separated planted
   clusters the approximate path still recovers the exact answer,
   because every vector's true NN lives in its own coarse cell;
3. *no broadcast of a side's matrix* — the only ``ray.put`` in the
   tier is the k x dim centroid table (source-level pin: the
   broadcast-B anti-pattern cannot silently return);
4. *empty sides* — an empty B (or A) side yields a typed empty result
   instead of a zero-width argmax crash.
"""

from __future__ import annotations

import inspect

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages import ann
from modernsearchengines_ray.stages.ann import mutual_nn_ivf

_DIM = 8


def _table(ids, labels, mat) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
        "label": pa.array(np.asarray(labels, np.int64), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })


def _brute_mutual(ids, labels, mat, la=0, lb=1) -> pd.DataFrame:
    """Reference mutual-NN with the plan's tie rules (max sim, ties to
    the smaller other-side id), raw dot/norm cosine."""
    ids = np.asarray(ids)
    a = np.flatnonzero(labels == la)
    b = np.flatnonzero(labels == lb)
    if len(a) == 0 or len(b) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "cos_sim"])
    a = a[np.argsort(ids[a])]
    b = b[np.argsort(ids[b])]
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat[a] @ mat[b].T) / np.outer(norms[a], norms[b])
    nn_ab = np.argmax(sims, axis=1)     # first max = smallest b id
    nn_ba = np.argmax(sims, axis=0)
    rows = [(int(ids[a][i]), int(ids[b][nn_ab[i]]),
             round(float(sims[i, nn_ab[i]]), 6))
            for i in range(len(a)) if nn_ba[nn_ab[i]] == i]
    return pd.DataFrame(rows, columns=["a_id", "b_id", "cos_sim"])


def _run(tab: pa.Table, **kw) -> pd.DataFrame:
    import ray

    res = mutual_nn_ivf(ray.data.from_arrow(tab).repartition(3),
                        0, 1, **kw).to_pandas()
    return res.sort_values(["a_id"]).reset_index(drop=True)


def test_full_probe_is_exact_on_random_data(ray_session):
    rng = np.random.RandomState(7)
    n = 120
    ids = np.arange(1, n + 1)
    labels = ids % 2
    mat = rng.randn(n, _DIM)
    got = _run(_table(ids, labels, mat), num_clusters=5, nprobe=None)
    want = _brute_mutual(ids, labels, mat).sort_values(["a_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=0, atol=1e-6)


def test_planted_clusters_nprobe_1_recovers_exact(ray_session):
    # 4 orthogonal planted clusters, both labels in each; every
    # vector's true cross-label NN is inside its own cluster, so
    # probing ONE coarse cell must already give the exact answer.
    rng = np.random.RandomState(11)
    per, k = 30, 4
    rows, labels, ids = [], [], []
    nid = 1
    for c in range(k):
        center = np.zeros(_DIM)
        center[c] = 1.0
        for j in range(per):
            v = center + rng.randn(_DIM) * 0.02
            rows.append(v)
            labels.append(j % 2)
            ids.append(nid)
            nid += 1
    mat = np.asarray(rows)
    labels = np.asarray(labels)
    ids = np.asarray(ids)
    got = _run(_table(ids, labels, mat), num_clusters=k, nprobe=1,
               sample_size=per * k)
    want = _brute_mutual(ids, labels, mat).sort_values(["a_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=0, atol=1e-6)
    assert len(got) > 0


def test_only_centroids_are_broadcast():
    src = inspect.getsource(ann.mutual_nn_ivf)
    puts = [ln for ln in src.splitlines() if "ray.put" in ln]
    assert puts == ["    cent_ref = ray.put(centroids)"], \
        "mutual_nn_ivf must broadcast ONLY the centroid matrix"


def test_empty_b_side(ray_session):
    import ray

    rng = np.random.RandomState(3)
    n = 20
    ids = np.arange(1, n + 1)
    labels = np.zeros(n, dtype=np.int64)     # A only, no B
    ds = mutual_nn_ivf(
        ray.data.from_arrow(_table(ids, labels, rng.randn(n, _DIM)))
        .repartition(3), 0, 1, num_clusters=2)
    # to_pandas on a typed-empty from_arrow dataset drops columns (a
    # Ray quirk), so the schema is asserted on the Dataset itself
    assert ds.schema().names == ["a_id", "b_id", "cos_sim"]
    assert ds.count() == 0
