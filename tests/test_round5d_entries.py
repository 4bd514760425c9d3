"""Known-value edge tests for the round-5d additions (Welch t-test,
Mann-Whitney U, clustering coefficient, k-core decomposition).  The
SQL-parity gate runs in test_driver_queries; these pin the math and
the empty/degenerate behavior on hand-built inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines.driver_queries import (
    q_ab_conversion_ztest,
    q_basket_lift,
    q_bfs_distance,
    q_borda_fusion,
    q_champion_topk,
    q_clarity_score,
    q_dsir_select,
    q_js_divergence_by_source,
    q_lexical_diversity,
    q_rbo_rankers,
    q_clustering_coefficient,
    q_kcore,
    q_mann_whitney,
    q_ooo_rate,
    q_welch_ttest,
)


@pytest.fixture()
def tmp_sf(tmp_path):
    def write(table: str, tab: pa.Table):
        pq.write_table(tab, tmp_path / f"{table}.parquet")
        return str(tmp_path)
    return write


def _lineitem(tmp_sf, prices, flags):
    return tmp_sf("lineitem", pa.table({
        "l_extendedprice": pa.array(prices, pa.float64()),
        "l_returnflag": pa.array(flags, pa.string()),
    }))


def _events(tmp_sf, user_ids):
    n = len(user_ids)
    return tmp_sf("events", pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "user_id": pa.array(user_ids, pa.int64()),
    }))


class TestWelchTTest:
    def test_known_value(self, ray_session, tmp_sf):
        # A: [1, 2, 3] (mean 2, var 1); R: [2, 4, 6, 8] (mean 5, var 20/3)
        sf = _lineitem(tmp_sf, [1, 2, 3, 2, 4, 6, 8],
                       ["A", "A", "A", "R", "R", "R", "R"])
        out = q_welch_ttest(sf)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["n_a"], r["n_r"]) == (3, 4)
        assert r["mean_a"] == 2.0 and r["mean_r"] == 5.0
        se = 1 / 3 + (20 / 3) / 4
        t = (2.0 - 5.0) / np.sqrt(se)
        dof = se ** 2 / ((1 / 3) ** 2 / 2 + ((20 / 3) / 4) ** 2 / 3)
        assert r["t_stat"] == round(t, 6)
        assert r["dof"] == round(dof, 4)

    def test_one_sided_and_empty(self, ray_session, tmp_sf):
        # SQL mirror: a side with n < 2 has no var_samp row -> empty
        sf = _lineitem(tmp_sf, [1.0, 2.0, 3.0], ["A", "A", "R"])
        assert len(q_welch_ttest(sf)) == 0
        sf = _lineitem(tmp_sf, [], [])
        assert len(q_welch_ttest(sf)) == 0

    def test_zero_variance_both_sides(self, ray_session, tmp_sf):
        # SQL mirror: x / sqrt(0) is NULL in DuckDB -> no row
        sf = _lineitem(tmp_sf, [10, 10, 20, 20], ["A", "A", "R", "R"])
        assert len(q_welch_ttest(sf)) == 0


class TestMannWhitney:
    def test_known_value_with_ties(self, ray_session, tmp_sf):
        # A: [1, 2, 2]; R: [2, 3]  -> midranks: 1->1, 2->3 (ties 2,3,4), 3->5
        # R_a = 1 + 3 + 3 = 7; U1 = 7 - 3*4/2 = 1
        sf = _lineitem(tmp_sf, [1, 2, 2, 2, 3],
                       ["A", "A", "A", "R", "R"])
        out = q_mann_whitney(sf)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["n_a"], r["n_r"]) == (3, 2)
        assert r["u_stat"] == 1.0
        # tie correction: one tie group of 3 -> sum(t^3 - t) = 24
        sigma2 = 3 * 2 / 12 * ((5 + 1) - 24 / (5 * 4))
        z = (1.0 - 3 * 2 / 2) / np.sqrt(sigma2)
        assert r["z_stat"] == round(z, 6)

    def test_one_sided_and_empty(self, ray_session, tmp_sf):
        sf = _lineitem(tmp_sf, [1.0, 2.0], ["A", "A"])
        assert len(q_mann_whitney(sf)) == 0
        sf = _lineitem(tmp_sf, [], [])
        assert len(q_mann_whitney(sf)) == 0

    def test_all_values_tie(self, ray_session, tmp_sf):
        # one giant tie group -> sigma2 = 0 -> NULL in SQL -> no row
        sf = _lineitem(tmp_sf, [5, 5, 5, 5], ["A", "A", "R", "R"])
        assert len(q_mann_whitney(sf)) == 0


class TestClusteringCoefficient:
    def test_known_graph(self, ray_session, tmp_sf):
        # users {0,1,2} -> edges 0-1,0-2,1-2,1-3,2-3,2-4; adjacency:
        # cc(0)=1, cc(1)=2/3, cc(2)=2/6, cc(3)=1, cc(4)=0 -> avg 3/5
        sf = _events(tmp_sf, [0, 1, 2, 1, 0])
        out = q_clustering_coefficient(sf)
        assert len(out) == 1
        assert out.iloc[0]["n_nodes"] == 5
        assert out.iloc[0]["avg_cc"] == 0.6

    def test_triangle_free(self, ray_session, tmp_sf):
        # a single u%10==8 user -> one edge 8-9, no wedges -> avg 0
        sf = _events(tmp_sf, [8])
        out = q_clustering_coefficient(sf)
        assert out.iloc[0]["n_nodes"] == 2
        assert out.iloc[0]["avg_cc"] == 0.0

    def test_empty(self, ray_session, tmp_sf):
        assert len(q_clustering_coefficient(_events(tmp_sf, []))) == 0


class TestChampionTopK:
    def _docs(self, tmp_sf, texts):
        return tmp_sf("documents", pa.table({
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_pruning_semantics(self, ray_session, tmp_sf):
        # m=1: champions(data)={1} (tf 2), champions(join)={3} (tf 3);
        # doc 2 holds BOTH terms but makes neither champion list ->
        # excluded from the candidate set (the inexact-top-k point)
        sf = self._docs(tmp_sf, ["data data", "data join",
                                 "join join join"])
        out = q_champion_topk(sf, m=1)
        assert sorted(out["doc_id"]) == [1, 3]

    def test_tie_breaks_on_doc_id(self, ray_session, tmp_sf):
        # equal tf -> champion is the LOWER doc_id (rn orders doc_id asc)
        sf = self._docs(tmp_sf, ["x data y", "data z"])
        out = q_champion_topk(sf, m=1)
        assert sorted(out["doc_id"]) == [1]

    def test_empty(self, ray_session, tmp_sf):
        assert len(q_champion_topk(self._docs(tmp_sf, []))) == 0


class TestBordaAndClarity:
    def _docs(self, tmp_sf, texts):
        return tmp_sf("documents", pa.table({
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_borda_single_doc_both_legs(self, ray_session, tmp_sf):
        # one matching doc ranks #1 in BOTH legs -> 20 + 20 points
        sf = self._docs(tmp_sf, ["data join stream"])
        out = q_borda_fusion(sf)
        assert list(out["doc_id"]) == [1]
        assert list(out["points"]) == [40]

    def test_borda_empty(self, ray_session, tmp_sf):
        assert len(q_borda_fusion(self._docs(tmp_sf, ["zebra"]))) == 0

    def test_clarity_identical_models_is_zero(self, ray_session, tmp_sf):
        # F = whole corpus -> feedback LM == corpus LM -> KL = 0
        sf = self._docs(tmp_sf, ["data data join"])
        out = q_clarity_score(sf)
        assert out.iloc[0]["n_terms"] == 2
        assert out.iloc[0]["clarity"] == 0.0

    def test_clarity_known_value(self, ray_session, tmp_sf):
        # F = {d1} only; p_F(data) = 1, p_C(data) = 2/4 -> KL = log2(2)
        sf = self._docs(tmp_sf, ["data data", "zebra zebra"])
        out = q_clarity_score(sf)
        assert out.iloc[0]["n_terms"] == 1
        assert out.iloc[0]["clarity"] == 1.0

    def test_clarity_no_match_empty(self, ray_session, tmp_sf):
        assert len(q_clarity_score(self._docs(tmp_sf, ["zebra"]))) == 0


class TestBasketLift:
    def _li(self, tmp_sf, rows):
        return tmp_sf("lineitem", pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }))

    def test_known_lift(self, ray_session, tmp_sf):
        # baskets: {1,2}, {1,2}, {1,3} -> pair (1,2) support 2;
        # (1,3) support 1 < min_support -> dropped.
        # lift(1,2) = 3 * 2 / (3 * 2) = 1.0
        sf = self._li(tmp_sf, [(10, 1), (10, 2), (20, 1), (20, 2),
                               (30, 1), (30, 3)])
        out = q_basket_lift(sf)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["p1"], r["p2"], r["n12"]) == (1, 2, 2)
        assert r["lift"] == 1.0

    def test_duplicate_lines_collapse(self, ray_session, tmp_sf):
        # the same part twice in one order is ONE basket item
        sf = self._li(tmp_sf, [(10, 1), (10, 1), (10, 2),
                               (20, 1), (20, 2)])
        out = q_basket_lift(sf)
        assert out.iloc[0]["n12"] == 2

    def test_no_pairs_and_empty(self, ray_session, tmp_sf):
        assert len(q_basket_lift(self._li(tmp_sf, [(10, 1)]))) == 0
        assert len(q_basket_lift(self._li(tmp_sf, []))) == 0


class TestLexicalDiversity:
    def test_known_values(self, ray_session, tmp_sf):
        # s1: tokens [a a b] -> 3 tokens, vocab 2 (a×2, b×1), hapax 1
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a", "b"], pa.string()),
            "source": pa.array(["s1", "s1"], pa.string())}))
        out = q_lexical_diversity(sf)
        r = out.iloc[0]
        assert (r["tokens"], r["vocab"]) == (3, 2)
        assert r["ttr"] == round(2 / 3, 6)
        assert r["hapax_rate"] == 0.5

    def test_empty(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "source": pa.array([], pa.string())}))
        assert len(q_lexical_diversity(sf)) == 0


class TestOooRate:
    def _ev(self, tmp_sf, rows):
        return tmp_sf("events", pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows],
                           pa.timestamp("us")),
        }))

    def test_known_rate(self, ray_session, tmp_sf):
        # user 1: ts 10,5,20 in arrival order -> pairs (10,5) ooo,
        # (5,20) ok; user 2: single event -> no pairs
        sf = self._ev(tmp_sf, [(1, 1, 10), (1, 2, 5), (1, 3, 20),
                               (2, 1, 7)])
        out = q_ooo_rate(sf)
        r = out.iloc[0]
        assert (r["n_pairs"], r["ooo_pairs"]) == (2, 1)
        assert r["ooo_rate"] == 0.5

    def test_no_pairs_and_empty(self, ray_session, tmp_sf):
        assert len(q_ooo_rate(self._ev(tmp_sf, [(1, 1, 3)]))) == 0
        assert len(q_ooo_rate(self._ev(tmp_sf, []))) == 0


class TestDsirSelect:
    def _corpus(self, tmp_sf, rows):
        return tmp_sf("documents", pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string())}))

    def test_target_like_doc_ranks_first(self, ray_session, tmp_sf):
        # raw doc 2 repeats the target's bigram; doc 3 is off-domain;
        # doc 4 has one token -> no bigrams -> absent
        sf = self._corpus(tmp_sf, [
            (1, "alpha beta alpha beta", "src0"),
            (2, "alpha beta alpha", "src5"),
            (3, "zebra yak zebra", "src5"),
            (4, "solo", "src5"),
        ])
        out = q_dsir_select(sf)
        assert list(out["doc_id"]) == [2, 3]
        assert out.iloc[0]["logw"] > out.iloc[1]["logw"]

    def test_no_target_is_empty(self, ray_session, tmp_sf):
        sf = self._corpus(tmp_sf, [(1, "a b c", "src5")])
        assert len(q_dsir_select(sf)) == 0
        sf = self._corpus(tmp_sf, [(1, "a b c", "src0")])
        assert len(q_dsir_select(sf)) == 0  # no raw pool either


class TestBfsDistance:
    def test_chorded_decade_distances(self, ray_session, tmp_sf):
        # users 0..9: seed {0}; +1/+2 chords give dists
        # 0,1,1,2,2,3,3,4,4,5; users 10..19 have no seed -> absent
        sf = _events(tmp_sf, list(range(20)))
        out = q_bfs_distance(sf).set_index("dist")["n_nodes"]
        assert out.to_dict() == {0: 1, 1: 2, 2: 2, 3: 2, 4: 2, 5: 1}

    def test_no_seeds_and_empty(self, ray_session, tmp_sf):
        assert len(q_bfs_distance(_events(tmp_sf, [42]))) == 0
        assert len(q_bfs_distance(_events(tmp_sf, []))) == 0


class TestAbConversionZtest:
    def test_known_value(self, ray_session, tmp_sf):
        # A (even): users 2 (converts), 4 (not); B (odd): 1 (converts),
        # 3, 5 (not) -> rates 1/2 vs 1/3, pooled 2/5
        rows = [(2, "purchase"), (2, "view"), (4, "view"),
                (1, "purchase"), (3, "click"), (5, "view")]
        sf = tmp_sf("events", pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string())}))
        out = q_ab_conversion_ztest(sf)
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (2, 3)
        assert r["rate_a"] == 0.5 and r["rate_b"] == round(1 / 3, 6)
        z = (0.5 - 1 / 3) / np.sqrt(0.4 * 0.6 * (1 / 2 + 1 / 3))
        assert r["z_stat"] == round(z, 6)

    def test_one_variant_and_empty(self, ray_session, tmp_sf):
        sf = tmp_sf("events", pa.table({
            "event_id": pa.array([0], pa.int64()),
            "user_id": pa.array([2], pa.int64()),
            "event_type": pa.array(["purchase"], pa.string())}))
        assert len(q_ab_conversion_ztest(sf)) == 0
        sf = tmp_sf("events", pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string())}))
        assert len(q_ab_conversion_ztest(sf)) == 0


class TestRboAndJsd:
    def test_rbo_identical_lists(self, ray_session, tmp_sf):
        # one matching doc -> both legs return [1] -> overlap@d = 1
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["data join stream"], pa.string())}))
        out = q_rbo_rankers(sf)
        expect = 0.1 * sum(0.9 ** (d - 1) / d for d in range(1, 21))
        assert out.iloc[0]["depth"] == 20
        assert out.iloc[0]["rbo"] == round(expect, 6)

    def test_rbo_empty(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["zebra"], pa.string())}))
        assert len(q_rbo_rankers(sf)) == 0

    def test_jsd_single_source_is_zero(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aa bb", "bb cc"], pa.string()),
            "source": pa.array(["s1", "s1"], pa.string())}))
        out = q_js_divergence_by_source(sf)
        assert list(out["source"]) == ["s1"]
        assert out.iloc[0]["jsd"] == 0.0
        assert out.iloc[0]["n_terms"] == 3

    def test_jsd_known_value(self, ray_session, tmp_sf):
        # s1 = {aa: 1.0}; s2 = {bb: 1.0}; corpus = {aa: .5, bb: .5};
        # independent dense recompute of 0.5*KL(Ps||M) + 0.5*KL(Pc||M)
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aa aa", "bb bb"], pa.string()),
            "source": pa.array(["s1", "s2"], pa.string())}))
        out = q_js_divergence_by_source(sf).set_index("source")

        def jsd(ps, pc):
            acc = 0.0
            for t in set(ps) | set(pc):
                a, b = ps.get(t, 0.0), pc.get(t, 0.0)
                m = (a + b) / 2
                if a:
                    acc += 0.5 * a * np.log2(a / m)
                if b:
                    acc += 0.5 * b * np.log2(b / m)
            return round(acc, 6)

        corpus = {"aa": 0.5, "bb": 0.5}
        assert out.loc["s1", "jsd"] == jsd({"aa": 1.0}, corpus)
        assert out.loc["s2", "jsd"] == jsd({"bb": 1.0}, corpus)
        assert out.loc["s1", "n_terms"] == 1  # only PRESENT rows

    def test_jsd_empty(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "source": pa.array([], pa.string())}))
        assert len(q_js_divergence_by_source(sf)) == 0


class TestPersonalizedPagerank:
    def _edges(self, rows):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "src": pa.array([r[0] for r in rows], pa.string()),
            "dst": pa.array([r[1] for r in rows], pa.string()),
        }))

    def test_restart_recurrence(self, ray_session):
        from modernsearchengines_ray.stages.graph import pagerank

        # two disjoint symmetric pairs; seed = {a}: the c-d component
        # must stay at 0 (no seed, no path from one), and a/b follow
        # the closed-form restart recurrence
        edges = self._edges([("a", "b"), ("b", "a"),
                             ("c", "d"), ("d", "c")])
        out = pagerank(edges, iters=3, damping=0.85, num_partitions=2,
                       seed_pred=lambda ns: np.asarray(
                           [n == "a" for n in ns])) \
            .to_pandas().set_index("node")["rank"]
        # r1: a=.15, b=.85; r2: a=.15+.85*.85, b=.85*.15;
        # r3: a=.15+.85*.1275, b=.85*.8725
        assert abs(out["a"] - 0.258375) < 1e-12
        assert abs(out["b"] - 0.741625) < 1e-12
        assert out["c"] == 0.0 and out["d"] == 0.0

    def test_empty_seed_set_is_zero_vector(self, ray_session):
        from modernsearchengines_ray.stages.graph import pagerank

        edges = self._edges([("a", "b"), ("b", "a")])
        out = pagerank(edges, iters=2, damping=0.85, num_partitions=2,
                       seed_pred=lambda ns: np.zeros(len(ns),
                                                     dtype=bool)) \
            .to_pandas()
        assert (out["rank"] == 0.0).all()


class TestKCore:
    def test_parity_decades(self, ray_session, tmp_sf):
        # even decade 0..9 -> squared path P10^2 (every node core 2);
        # odd decade 10..19 -> plain path P10 (every node core 1)
        sf = _events(tmp_sf, list(range(20)))
        out = q_kcore(sf).set_index("core")
        assert sorted(out.index) == [1, 2]
        assert out.loc[1, "n_nodes"] == 10
        assert out.loc[2, "n_nodes"] == 10

    def test_single_edge(self, ray_session, tmp_sf):
        # one user u%10==8 in an even decade -> edge 8-9 only -> core 1
        sf = _events(tmp_sf, [8])
        out = q_kcore(sf)
        assert len(out) == 1
        assert out.iloc[0]["core"] == 1 and out.iloc[0]["n_nodes"] == 2

    def test_empty(self, ray_session, tmp_sf):
        assert len(q_kcore(_events(tmp_sf, []))) == 0
