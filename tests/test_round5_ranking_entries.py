"""Known-value edge tests for the six final round-5 driver entries
(lm_jm_topk, pl2_topk, zipf_slope, heaps_law, term_entropy_by_source,
prox_boosted_topk).  The SQL-parity gate runs in test_driver_queries;
these pin the scoring math, decile bookkeeping, and empty/degenerate
behavior on hand-built inputs the gate data cannot isolate."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines.driver_queries import (
    LM_LAMBDA,
    PROX_BETA,
    q_heaps_law,
    q_lm_jm_topk,
    q_pl2_topk,
    q_prox_boosted_topk,
    q_term_entropy_by_source,
    q_zipf_slope,
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


class TestLmJm:
    def test_known_score(self, ray_session, tmp_sf):
        # total=5 tokens; ctf(data)=2, ctf(join)=1, 'stream' absent
        # (drops on both sides).  p(data|C)=0.4, p(join|C)=0.2.
        sf = _docs(tmp_sf, ["data data x", "join y"])
        out = q_lm_jm_topk(sf)
        lam = LM_LAMBDA
        d1 = round(math.log((1 - lam) * 2 / 3 + lam * 0.4)
                   + math.log(lam * 0.2), 6)
        d2 = round(math.log(lam * 0.4)
                   + math.log((1 - lam) * 1 / 2 + lam * 0.2), 6)
        got = dict(zip(out["doc_id"], out["score"]))
        assert got == {1: d1, 2: d2}
        # tf=0 background terms still score: doc2 outranks doc1 here
        assert out["doc_id"].tolist()[0] == 2

    def test_all_query_terms_absent(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x y z"])
        out = q_lm_jm_topk(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "score"]


class TestPl2:
    def test_known_single_term_score(self, ray_session, tmp_sf):
        # avgdl=2, n_docs=2, ctf(data)=1 -> lambda=0.5;
        # tfn = 1*log2(1 + c*2/2) = 1 with PL2_C=1.
        sf = _docs(tmp_sf, ["data x", "y z"])
        out = q_pl2_topk(sf)
        tfn, lam = 1.0, 0.5
        want = round((tfn * math.log2(tfn / lam)
                      + (lam - tfn) * math.log2(math.e)
                      + 0.5 * math.log2(2 * math.pi * tfn))
                     / (tfn + 1.0), 6)
        assert out["doc_id"].tolist() == [1]  # tf=0 docs never ship
        assert out["score"].tolist() == [want]

    def test_no_matches_is_empty(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x y"])
        out = q_pl2_topk(sf)
        assert len(out) == 0


class TestZipfSlope:
    def test_perfect_two_point_fit(self, ray_session, tmp_sf):
        # freqs 4 (rank 1) and 2 (rank 2): ln-ln slope exactly
        # -ln2/ln2 = -1, intercept ln(4).
        sf = _docs(tmp_sf, ["a a a a b b"])
        out = q_zipf_slope(sf)
        assert out["n_terms"].tolist() == [2]
        assert out["slope"].tolist() == [-1.0]
        assert out["intercept"].tolist() == [round(math.log(4), 6)]

    def test_single_term_vocab_no_fit_row(self, ray_session, tmp_sf):
        # var(ln rank)=0 -> SQL's HAVING count>=2 yields zero rows
        sf = _docs(tmp_sf, ["a a a"])
        out = q_zipf_slope(sf)
        assert len(out) == 0
        assert list(out.columns) == ["n_terms", "slope", "intercept"]


class TestHeapsLaw:
    def test_two_doc_deciles(self, ray_session, tmp_sf):
        # doc1 "a b", doc2 "a c": k=1 for deciles 1-5, k=2 for 6-10;
        # cumulative tokens 2 then 4; vocab 2 then 3 ('a' first-seen
        # in doc1 only).
        sf = _docs(tmp_sf, ["a b", "a c"])
        out = q_heaps_law(sf)
        assert out["decile"].tolist() == list(range(1, 11))
        assert out["docs_seen"].tolist() == [1] * 5 + [2] * 5
        assert out["tokens_seen"].tolist() == [2] * 5 + [4] * 5
        assert out["vocab_size"].tolist() == [2] * 5 + [3] * 5


class TestTermEntropyBySource:
    def test_known_entropy(self, ray_session, tmp_sf):
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["s1", "s2"], pa.string()),
            "text": pa.array(["a a b", "c c c"], pa.string()),
        }))
        out = q_term_entropy_by_source(sf)
        got = {r.source: (r.n_tokens, r.n_terms, r.entropy)
               for r in out.itertuples()}
        h1 = round(math.log(3) - (2 * math.log(2)) / 3, 6)
        assert got["s1"] == (3, 2, h1)
        # single-term source: H = ln(3) - 3*ln(3)/3 = 0 exactly
        assert got["s2"] == (3, 1, 0.0)


class TestProxBoosted:
    def test_single_candidate_bm25_leg_zero(self, ray_session, tmp_sf):
        # one candidate -> min-max degenerates, score = beta/(1+win)
        sf = _docs(tmp_sf, ["data join", "data only here"])
        out = q_prox_boosted_topk(sf)
        assert out["doc_id"].tolist() == [1]
        assert out["min_window"].tolist() == [1]
        assert out["score"].tolist() == [round(PROX_BETA / 2.0, 6)]

    def test_window_orders_equal_bm25_docs(self, ray_session, tmp_sf):
        # same tf/dl in both docs -> identical BM25; the proximity
        # leg alone must rank the tighter window first
        sf = _docs(tmp_sf, ["data join x y", "data x y join"])
        out = q_prox_boosted_topk(sf)
        assert out["doc_id"].tolist() == [1, 2]
        assert out["min_window"].tolist() == [1, 3]

    def test_no_co_occurrence_is_empty(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["data only", "join only"])
        out = q_prox_boosted_topk(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "min_window", "score"]
