"""Unit tests for the late round-5 driver entries' edge behavior on
hand-built inputs (the SQL-parity gate runs in test_driver_queries;
these pin known-value scoring math, tie handling, and exclusion rules
the gate data cannot isolate)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines.driver_queries import (
    B,
    K1,
    LM_MU,
    PRF_FB_DOCS,
    q_hard_negatives,
    q_lm_dirichlet_topk,
    q_ltr_features,
    q_min_window,
    q_prf_expand,
    q_tfidf_cosine_topk,
)


@pytest.fixture()
def tmp_sf(tmp_path):
    def write(table: str, tab: pa.Table):
        pq.write_table(tab, tmp_path / f"{table}.parquet")
        return str(tmp_path)
    return write


def _docs(tmp_sf, texts):
    return tmp_sf("documents", pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestMinWindow:
    def test_known_positions(self, ray_session, tmp_sf):
        # tokens: [data, x, join, data] -> pairs |0-2|=2, |3-2|=1
        sf = _docs(tmp_sf, ["data x join data", "data only", "neither"])
        out = q_min_window(sf).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert out["min_window"].tolist() == [1]

    def test_adjacent_and_reversed_order(self, ray_session, tmp_sf):
        # join precedes data: distance is symmetric
        sf = _docs(tmp_sf, ["join data"])
        out = q_min_window(sf).to_pandas()
        assert out["min_window"].tolist() == [1]


class TestLmDirichlet:
    def test_known_score(self, ray_session, tmp_sf):
        # corpus: ctf(data)=2, ctf(join)=1, total=5; 'stream' absent
        sf = _docs(tmp_sf, ["data data x", "join y"])
        out = q_lm_dirichlet_topk(sf)
        p_data, p_join = 2 / 5, 1 / 5
        exp1 = (np.log((2 + LM_MU * p_data) / (3 + LM_MU))
                + np.log((0 + LM_MU * p_join) / (3 + LM_MU)))
        exp2 = (np.log((0 + LM_MU * p_data) / (2 + LM_MU))
                + np.log((1 + LM_MU * p_join) / (2 + LM_MU)))
        got = dict(zip(out["doc_id"], out["score"]))
        assert got[1] == pytest.approx(round(exp1, 6), abs=1e-9)
        assert got[2] == pytest.approx(round(exp2, 6), abs=1e-9)

    def test_all_query_terms_absent(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["alpha beta", "gamma"])
        out = q_lm_dirichlet_topk(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "score"]


class TestTfidfCosine:
    def test_known_score(self, ray_session, tmp_sf):
        # doc1 vector: data tf=2 (w=1+ln2), beta tf=1 (w=1);
        # norm=sqrt((1+ln2)^2+1); idf(data)=ln(N/df)=ln(2/1)
        sf = _docs(tmp_sf, ["data data beta", "zzz"])
        out = q_tfidf_cosine_topk(sf)
        w = 1 + np.log(2)
        exp = w * np.log(2.0) / np.sqrt(w * w + 1.0)
        assert out["doc_id"].tolist() == [1]
        assert out["score"].iloc[0] == pytest.approx(round(exp, 6),
                                                     abs=1e-9)


class TestPrfExpand:
    def test_weights_and_exclusions(self, ray_session, tmp_sf):
        # feedback set = docs matching the query (1, 2); doc 3 never
        # contributes terms; query terms themselves are excluded
        sf = _docs(tmp_sf, ["data apple apple", "data banana", "cherry"])
        out = q_prf_expand(sf)
        got = dict(zip(out["term"], out["weight"]))
        n = 3.0
        assert set(got) == {"apple", "banana"}
        assert got["apple"] == pytest.approx(
            round(2 * np.log(n / 1) / PRF_FB_DOCS, 6), abs=1e-9)
        assert got["banana"] == pytest.approx(
            round(1 * np.log(n / 1) / PRF_FB_DOCS, 6), abs=1e-9)
        # higher tf ranks first
        assert out["term"].iloc[0] == "apple"


class TestLtrFeatures:
    def test_known_row(self, ray_session, tmp_sf):
        # doc1 tokens [data, join, data, z]: n_matched=2, tf_sum=3,
        # dl=4; doc2 contributes only to N and avgdl
        sf = _docs(tmp_sf, ["data join data z", "w w"])
        out = q_ltr_features(sf)
        row = out[out["doc_id"] == 1].iloc[0]
        assert int(row["n_matched"]) == 2
        assert int(row["tf_sum"]) == 3
        assert int(row["dl"]) == 4
        n, avgdl = 2.0, 3.0
        idf = np.log((n - 1 + 0.5) / (1 + 0.5) + 1.0)

        def bm25(tf, dl):
            return idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl / avgdl))

        assert row["bm25"] == pytest.approx(
            round(bm25(2, 4) + bm25(1, 4), 6), abs=1e-9)
        assert row["max_idf"] == pytest.approx(round(idf, 6), abs=1e-9)


class TestHardNegatives:
    def _sf(self, tmp_sf, vecs, labels):
        return tmp_sf("embeddings", pa.table({
            "vec_id": pa.array(list(range(1, len(vecs) + 1)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
            "label": pa.array(labels, pa.int64()),
        }))

    def test_cross_label_argmax(self, ray_session, tmp_sf):
        sf = self._sf(tmp_sf,
                      [[1, 0], [0.9, 0.1], [0, 1]], [0, 0, 1])
        out = q_hard_negatives(sf).to_pandas().set_index("vec_id")
        # both label-0 vecs must pick the only label-1 vec and v.v.
        assert int(out.loc[1, "neg_id"]) == 3
        assert int(out.loc[2, "neg_id"]) == 3
        # sim(c,a)=0 < sim(c,b)~0.110 -> b
        assert int(out.loc[3, "neg_id"]) == 2

    def test_tie_breaks_to_smallest_id(self, ray_session, tmp_sf):
        # two identical cross-label candidates: smallest neg_id wins
        sf = self._sf(tmp_sf,
                      [[1, 0], [0, 1], [0, 1]], [0, 1, 1])
        out = q_hard_negatives(sf).to_pandas().set_index("vec_id")
        assert int(out.loc[1, "neg_id"]) == 2

    def test_single_label_returns_empty(self, ray_session, tmp_sf):
        sf = self._sf(tmp_sf, [[1, 0], [0, 1]], [5, 5])
        out = q_hard_negatives(sf)
        assert len(out) == 0
        assert list(out.columns) == ["vec_id", "neg_id", "cos_sim"]


class TestDistributionMatch:
    def test_underrepresented_bucket_keeps_all(self, ray_session, tmp_sf):
        from modernsearchengines_ray.stages.sampling import (
            distribution_match_sample)
        import ray.data as rd

        # bucket 3 (>=450) has 2 docs vs target 0.4 -> highest
        # target/size ratio -> permille 1000 -> all survive; bucket 0
        # (60 docs vs target 0.1) downsamples hard
        n0 = 60
        tab = pa.table({
            "doc_id": pa.array(list(range(1, n0 + 1)) + [900, 901],
                               pa.int64()),
            "n_chars": pa.array([100] * n0 + [500, 520], pa.int64()),
        })
        ds = rd.from_arrow(tab)
        out = distribution_match_sample(
            ds, value_col="n_chars", id_col="doc_id",
            boundaries=(150.0, 300.0, 450.0),
            target_shares=(0.1, 0.2, 0.3, 0.4)).to_pandas()
        kept3 = out[out["bucket"] == 3]["doc_id"].tolist()
        assert sorted(kept3) == [900, 901]
        # rate for bucket 0: floor(1000 * (0.1/60) / (0.4/2)) = 8
        kept0 = out[out["bucket"] == 0]
        assert len(kept0) <= n0 * 0.2  # heavily downsampled

    def test_deterministic_across_block_layouts(self, ray_session,
                                                tmp_sf):
        from modernsearchengines_ray.stages.sampling import (
            distribution_match_sample)
        import ray.data as rd

        tab = pa.table({
            "doc_id": pa.array(list(range(1, 201)), pa.int64()),
            "n_chars": pa.array([(i * 37) % 600 for i in range(200)],
                                pa.int64()),
        })
        args = dict(value_col="n_chars", id_col="doc_id",
                    boundaries=(150.0, 300.0, 450.0),
                    target_shares=(0.1, 0.2, 0.3, 0.4))
        a = distribution_match_sample(
            rd.from_arrow(tab), **args).to_pandas()
        b = distribution_match_sample(
            rd.from_arrow(tab).repartition(7), **args).to_pandas()
        key = ["doc_id", "bucket"]
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True))

    def test_empty_input(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
        }))
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_distribution_match)
        out = q_distribution_match(sf)
        assert out.count() == 0


class TestRankEval:
    def test_single_perfect_candidate(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_rank_eval)

        sf = _docs(tmp_sf, ["data join stream", "unrelated words"])
        out = q_rank_eval(sf)
        assert int(out["n_candidates"].iloc[0]) == 1
        assert out["ndcg10"].iloc[0] == pytest.approx(1.0)
        assert out["mrr"].iloc[0] == pytest.approx(1.0)
        assert out["p10"].iloc[0] == pytest.approx(0.1)

    def test_graded_order_is_ideal(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_rank_eval)

        # doc2 (rel 2) outranks doc1 (rel 1) under BM25, matching the
        # ideal ordering -> ndcg 1.0; only doc2 counts as a binary hit
        sf = _docs(tmp_sf, ["data filler", "data join"])
        out = q_rank_eval(sf)
        assert int(out["n_candidates"].iloc[0]) == 2
        assert out["ndcg10"].iloc[0] == pytest.approx(1.0)
        assert out["mrr"].iloc[0] == pytest.approx(1.0)
        assert out["p10"].iloc[0] == pytest.approx(0.1)

    def test_no_candidates_returns_empty(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_rank_eval)

        sf = _docs(tmp_sf, ["alpha", "beta"])
        out = q_rank_eval(sf)
        assert len(out) == 0
