"""PageRank conformance: hand-checked star graph + tier parity."""

from __future__ import annotations

import numpy as np
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


def _numpy_pagerank(pairs, iters, d=0.85):
    """Dense reference: teleport + damped contributions + uniform
    dangling-mass redistribution (the standard correction)."""
    import numpy as np

    nodes = sorted({n for e in pairs for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in pairs:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in pairs:
            contrib[idx[t]] += r[idx[s]] / out[idx[s]]
        dm = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dm / n)
    return dict(zip(nodes, r))


class TestPagerankDirected:
    """General directed graphs (VERDICT r3 #5 / ADVICE r3): dangling
    nodes redistribute mass, no-in-edge nodes keep teleport rank, and
    both tiers agree with a dense numpy reference."""

    # b is dangling (no out-edges); a has no in-edges
    DANGLING = [("a", "b"), ("c", "b"), ("a", "c")]

    @pytest.mark.parametrize("reduce", ["broadcast", "partitioned"])
    def test_dangling_matches_numpy(self, ray_session, reduce):
        got = _ranks(_edges_ds(self.DANGLING), iters=3, reduce=reduce)
        want = _numpy_pagerank(self.DANGLING, iters=3)
        assert set(got) == set(want) == {"a", "b", "c"}
        for node in want:
            assert got[node] == pytest.approx(want[node], abs=1e-12), node
        assert sum(got.values()) == pytest.approx(1.0)

    @pytest.mark.parametrize("reduce", ["broadcast", "partitioned"])
    def test_no_in_edge_node_keeps_teleport_rank(self, ray_session,
                                                 reduce):
        # chain a -> b -> c: a never receives mass but must stay in
        # the state at (1-d)/N + d*(dangling mass)/N every iteration
        pairs = [("a", "b"), ("b", "c")]
        got = _ranks(_edges_ds(pairs), iters=2, reduce=reduce)
        want = _numpy_pagerank(pairs, iters=2)
        assert set(got) == {"a", "b", "c"}
        for node in want:
            assert got[node] == pytest.approx(want[node], abs=1e-12), node

    def test_tier_parity_directed(self, ray_session):
        import numpy as np

        rng = np.random.RandomState(3)
        pairs = sorted({(f"n{rng.randint(12)}", f"n{rng.randint(12)}")
                        for _ in range(40)})
        pairs = [(s, t) for s, t in pairs if s != t]
        ds = _edges_ds(pairs)
        a = _ranks(ds, iters=3, reduce="broadcast")
        b = _ranks(ds, iters=3, reduce="partitioned")
        want = _numpy_pagerank(pairs, iters=3)
        assert set(a) == set(b) == set(want)
        for node in a:
            assert a[node] == pytest.approx(b[node], abs=1e-12)
            assert a[node] == pytest.approx(want[node], abs=1e-12)


class TestConnectedComponents:
    def _run(self, edge_rows, **kw):
        import ray.data as rd

        from modernsearchengines_ray.stages.graph import (
            connected_components,
        )

        t = pa.table({
            "src": pa.array([a for a, _ in edge_rows], pa.int64()),
            "dst": pa.array([b for _, b in edge_rows], pa.int64()),
        })
        out = connected_components(rd.from_arrow(t),
                                   num_partitions=2, **kw).to_pandas()
        return dict(zip(out["node"], out["component"]))

    @staticmethod
    def _union_find(edge_rows):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    def test_long_chain_multi_hop(self, ray_session):
        # 0-1-2-...-15: min label must travel 15 hops; pointer jumping
        # makes that ~log rounds, but correctness is what's pinned here
        edges = [(i, i + 1) for i in range(15)]
        got = self._run(edges)
        assert got == {i: 0 for i in range(16)}

    def test_random_graph_matches_union_find(self, ray_session):
        rng = np.random.RandomState(4)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 60, (80, 2))]
        got = self._run(edges)
        assert got == self._union_find(edges)

    def test_self_loops_and_duplicates(self, ray_session):
        edges = [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)]
        got = self._run(edges)
        assert got == {5: 5, 1: 1, 2: 1, 7: 7, 8: 7}

    def test_direction_ignored(self, ray_session):
        assert self._run([(9, 3)]) == {3: 3, 9: 3}

    def test_empty_edges(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.graph import (
            connected_components,
        )

        t = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        out = connected_components(rd.from_arrow(t), num_partitions=2)
        assert out.count() == 0
        assert out.schema().names == ["node", "component"]


class TestHITS:
    """stages/graph.py:hits — L1-normalized hubs/authorities."""

    def _run(self, edges, reduce="broadcast", iters=2):
        import ray.data as rd

        from modernsearchengines_ray.stages.graph import hits

        t = pa.table({
            "src": pa.array([a for a, _ in edges], pa.string()),
            "dst": pa.array([b for _, b in edges], pa.string()),
        })
        out = hits(rd.from_arrow(t), iters=iters, num_partitions=2,
                   reduce=reduce).to_pandas()
        return {r.node: (r.hub, r.authority) for r in out.itertuples()}

    def _reference(self, edges, iters=2):
        nodes = sorted({n for e in edges for n in e})
        h = {n: 1.0 for n in nodes}
        a = {n: 0.0 for n in nodes}
        for _ in range(iters):
            a = {n: sum(h[s] for s, d in edges if d == n)
                 for n in nodes}
            tot = sum(a.values())
            a = {n: v / tot for n, v in a.items()}
            h = {n: sum(a[d] for s, d in edges if s == n)
                 for n in nodes}
            tot = sum(h.values())
            h = {n: v / tot for n, v in h.items()}
        return {n: (h[n], a[n]) for n in nodes}

    EDGES = [("u1", "v1"), ("u1", "v2"), ("u2", "v1"), ("u3", "v3"),
             ("v1", "u1")]

    def test_matches_reference(self, ray_session):
        got = self._run(self.EDGES)
        want = self._reference(self.EDGES)
        assert set(got) == set(want)
        for n in want:
            assert got[n][0] == pytest.approx(want[n][0], abs=1e-12)
            assert got[n][1] == pytest.approx(want[n][1], abs=1e-12)

    def test_tier_parity(self, ray_session):
        b = self._run(self.EDGES, reduce="broadcast")
        p = self._run(self.EDGES, reduce="partitioned")
        assert set(b) == set(p)
        for n in b:
            assert b[n] == pytest.approx(p[n], abs=1e-12)

    def test_sums_normalized(self, ray_session):
        got = self._run(self.EDGES)
        assert sum(v[0] for v in got.values()) == pytest.approx(1.0)
        assert sum(v[1] for v in got.values()) == pytest.approx(1.0)

    def test_no_inedge_node_has_zero_authority(self, ray_session):
        got = self._run([("a", "b")])
        assert got["a"][1] == 0.0  # nothing points at a
        assert got["b"][0] == 0.0  # b points at nothing
        assert got["a"][0] == 1.0
        assert got["b"][1] == 1.0

    def test_empty_edges(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.graph import hits

        t = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
        out = hits(rd.from_arrow(t), num_partitions=2)
        assert out.count() == 0
        assert out.schema().names == ["node", "hub", "authority"]
