"""stages/skyline.py — 2-D Pareto frontier."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from modernsearchengines_ray.stages.skyline import (
    _dedup_pairs,
    _local_skyline,
    skyline_2d,
)


def brute_skyline(pts):
    """O(n²) oracle: minimize x, maximize y over distinct points."""
    pts = sorted(set(pts))
    out = []
    for (x, y) in pts:
        dominated = any(
            bx <= x and by >= y and (bx < x or by > y)
            for bx, by in pts)
        if not dominated:
            out.append((x, y))
    return sorted(out)


def run_local(pts):
    x = np.array([p[0] for p in pts], dtype=np.float64)
    y = np.array([p[1] for p in pts], dtype=np.float64)
    x, y = _dedup_pairs(x, y)
    keep = _local_skyline(x, y)
    return sorted(zip(x[keep].tolist(), y[keep].tolist()))


class TestLocalScan:
    def test_simple_frontier(self):
        pts = [(1, 1), (2, 3), (3, 2), (1, 4), (5, 5)]
        assert run_local(pts) == brute_skyline(pts)

    def test_duplicates_and_ties(self):
        pts = [(1, 1), (1, 1), (1, 2), (2, 2), (2, 1), (3, 2)]
        assert run_local(pts) == brute_skyline(pts)

    def test_all_on_frontier(self):
        # perfectly anti-correlated: every point survives
        pts = [(i, 10 - i) for i in range(10)]
        assert run_local(pts) == brute_skyline(pts)

    def test_single_point_dominates_all(self):
        pts = [(0, 100)] + [(i, j) for i in range(1, 5)
                            for j in range(5)]
        assert run_local(pts) == [(0.0, 100.0)]

    def test_random_matches_brute(self):
        rng = np.random.RandomState(7)
        pts = [(int(a), int(b)) for a, b in rng.randint(0, 30, (200, 2))]
        assert run_local(pts) == brute_skyline(pts)

    def test_empty(self):
        assert run_local([]) == []


class TestSkylineStage:
    def test_distributed_matches_brute(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(11)
        xs = rng.randint(0, 50, 500).astype(np.float64)
        ys = rng.randint(0, 50, 500).astype(np.float64)
        ds = rd.from_arrow(pa.table({"x": xs, "y": ys})) \
            .repartition(8)  # force multi-block local+global phases
        out = skyline_2d(ds, "x", "y")
        got = sorted(zip(out["x"].to_pylist(), out["y"].to_pylist()))
        assert got == brute_skyline(list(zip(xs.tolist(), ys.tolist())))

    def test_nulls_excluded(self, ray_session):
        import ray.data as rd

        t = pa.table({"x": pa.array([1.0, None, 2.0], pa.float64()),
                      "y": pa.array([1.0, 99.0, 2.0], pa.float64())})
        out = skyline_2d(rd.from_arrow(t), "x", "y")
        got = sorted(zip(out["x"].to_pylist(), out["y"].to_pylist()))
        assert got == [(1.0, 1.0), (2.0, 2.0)]
