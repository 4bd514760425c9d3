"""Exact distributed two-sample KS statistic (stages/drift.py) vs a
local brute-force ECDF sweep."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute_ks(v1: np.ndarray, v2: np.ndarray) -> float:
    """Max |F1 - F2| over the union of sample points, in the same
    int-division op order as the stage and the SQL oracle."""
    pts = np.unique(np.concatenate([v1, v2]))
    c1 = np.searchsorted(np.sort(v1), pts, side="right")
    c2 = np.searchsorted(np.sort(v2), pts, side="right")
    return float(np.max(np.abs(c1.astype(np.float64) / len(v1)
                               - c2.astype(np.float64) / len(v2))))


def _run(v1, v2, bins=256):
    import ray.data as rd

    from modernsearchengines_ray.stages.drift import ks_statistic

    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    tab = pa.table({
        "g": pa.array(["a"] * len(v1) + ["b"] * len(v2), pa.string()),
        "v": pa.array(np.concatenate([v1, v2]), pa.float64()),
    })
    ds = rd.from_arrow(tab)
    got = ks_statistic(ds, "v", "g", "a", "b", bins=bins)
    assert int(got["n1"][0].as_py()) == len(v1)
    assert int(got["n2"][0].as_py()) == len(v2)
    return float(got["ks"][0].as_py())


class TestKSStatistic:
    def test_random_same_distribution(self, ray_session):
        rng = np.random.default_rng(5)
        v1 = rng.normal(0.0, 1.0, 4000)
        v2 = rng.normal(0.0, 1.0, 3000)
        assert _run(v1, v2) == _brute_ks(v1, v2)

    def test_shifted_distributions(self, ray_session):
        rng = np.random.default_rng(6)
        v1 = rng.normal(0.0, 1.0, 2000)
        v2 = rng.normal(0.7, 1.3, 2500)
        got = _run(v1, v2)
        assert got == _brute_ks(v1, v2)
        assert got > 0.2  # genuinely drifted

    def test_interior_peak_with_coarse_bins(self, ray_session):
        # group a's mass precedes group b's INSIDE the single bin, so
        # the boundary diff is ~0 and only the candidate sweep finds
        # D — the refinement path, exercised with bins=1
        v1 = np.linspace(0.0, 0.4, 100)
        v2 = np.linspace(0.5, 1.0, 100)
        assert _run(v1, v2, bins=1) == _brute_ks(v1, v2) == 1.0

    def test_ties_across_groups(self, ray_session):
        v1 = np.repeat([1.0, 2.0, 3.0], 50)
        v2 = np.repeat([2.0, 3.0, 4.0], 40)
        assert _run(v1, v2) == _brute_ks(v1, v2)

    def test_constant_column(self, ray_session):
        v1 = np.full(30, 7.0)
        v2 = np.full(50, 7.0)
        assert _run(v1, v2) == 0.0

    def test_empty_group_raises(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.drift import ks_statistic

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "a"], pa.string()),
            "v": pa.array([1.0, 2.0], pa.float64()),
        }))
        with pytest.raises(ValueError, match="empty group"):
            ks_statistic(ds, "v", "g", "a", "b")

    def test_nulls_excluded(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.drift import ks_statistic

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "v": pa.array([1.0, None, 2.0, 1.5, None], pa.float64()),
        }))
        got = ks_statistic(ds, "v", "g", "a", "b")
        assert int(got["n1"][0].as_py()) == 2
        assert int(got["n2"][0].as_py()) == 1
        want = _brute_ks(np.array([1.0, 2.0]), np.array([1.5]))
        assert float(got["ks"][0].as_py()) == want
