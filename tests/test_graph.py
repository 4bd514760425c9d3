"""PageRank conformance: hand-checked star graph + tier parity."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    src, dst = zip(*pairs)
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
    }))


def _ranks(ds, **kw):
    from modernsearchengines_ray.stages.graph import pagerank

    df = pagerank(ds, **kw).to_pandas()
    return dict(zip(df["node"], df["rank"]))


STAR = [("c", "x"), ("c", "y"), ("c", "z"),
        ("x", "c"), ("y", "c"), ("z", "c")]


class TestPagerank:
    def test_star_two_iterations_hand_checked(self, ray_session):
        # N=4, d=0.85, teleport=0.0375, uniform start 0.25:
        # iter1: center 0.675, leaves 0.1083..; iter2: center
        # 0.31375, leaves 0.22875 (mass stays 1)
        got = _ranks(_edges_ds(STAR), iters=2)
        assert got["c"] == pytest.approx(0.31375)
        for leaf in ("x", "y", "z"):
            assert got[leaf] == pytest.approx(0.22875)
        assert sum(got.values()) == pytest.approx(1.0)

    def test_symmetric_pair_is_stationary(self, ray_session):
        got = _ranks(_edges_ds([("a", "b"), ("b", "a")]), iters=3)
        assert got["a"] == pytest.approx(0.5)
        assert got["b"] == pytest.approx(0.5)

    def test_tier_parity(self, ray_session):
        ds = _edges_ds(STAR + [("x", "y"), ("y", "x")])
        a = _ranks(ds, iters=2, reduce="broadcast")
        b = _ranks(ds, iters=2, reduce="partitioned")
        assert set(a) == set(b)
        for node in a:
            assert a[node] == pytest.approx(b[node], abs=1e-12)

    def test_bad_tier_raises(self, ray_session):
        from modernsearchengines_ray.stages.graph import pagerank

        with pytest.raises(ValueError):
            pagerank(_edges_ds(STAR), reduce="nope")
