"""Known-value edge tests for the round-5 additions bm25f_topk,
dup_cluster_hist and bigram_xent.  The SQL-parity gate runs in
test_driver_queries; these pin the fielded-scoring math, histogram
bookkeeping and empty/degenerate behavior on hand-built inputs."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines.driver_queries import (
    _BM25F_B,
    _BM25F_HEAD_CHARS,
    _BM25F_WEIGHT,
    _PASSAGE_LEN,
    B,
    K1,
    q_bigram_xent,
    q_bm25f_topk,
    q_dup_cluster_hist,
    q_max_passage_topk,
    q_sample_exact_n_per_group,
    q_snippet_window,
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


class TestBm25f:
    def test_short_docs_head_field_only(self, ray_session, tmp_sf):
        # Both docs shorter than the head cut: body is empty, so BM25F
        # degenerates to single-field BM25 at head weight/b.
        sf = _docs(tmp_sf, ["data x", "y z"])
        out = q_bm25f_topk(sf)
        idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)  # df(data)=1
        wh, bh = _BM25F_WEIGHT["head"], _BM25F_B["head"]
        wtf = wh * 1.0 / (1 - bh + bh * 2.0 / 2.0)  # len=avglen=2
        want = round(idf * wtf / (K1 + wtf), 6)
        assert out["doc_id"].tolist() == [1]
        assert out["score"].tolist() == [want]

    def test_cross_field_accumulation(self, ray_session, tmp_sf):
        # doc1: 'data' in head AND body; the two field contributions
        # must sum BEFORE the saturation, not score separately.
        head = ("data " + "x " * 57 + "x")
        assert len(head) == _BM25F_HEAD_CHARS
        sf = _docs(tmp_sf, [head + "data join", "join"])
        out = q_bm25f_topk(sf)
        # field lengths: doc1 head=59, doc1 body=2, doc2 head=1
        avg_head, avg_body = (59 + 1) / 2.0, 2.0
        wh, bh = _BM25F_WEIGHT["head"], _BM25F_B["head"]
        wb, bb = _BM25F_WEIGHT["body"], _BM25F_B["body"]
        idf_data = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
        idf_join = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
        wtf_data = (wh * 1.0 / (1 - bh + bh * 59 / avg_head)
                    + wb * 1.0 / (1 - bb + bb * 2 / avg_body))
        wtf_join_1 = wb * 1.0 / (1 - bb + bb * 2 / avg_body)
        wtf_join_2 = wh * 1.0 / (1 - bh + bh * 1 / avg_head)
        s1 = round(idf_data * wtf_data / (K1 + wtf_data)
                   + idf_join * wtf_join_1 / (K1 + wtf_join_1), 6)
        s2 = round(idf_join * wtf_join_2 / (K1 + wtf_join_2), 6)
        got = dict(zip(out["doc_id"], out["score"]))
        assert got == pytest.approx({1: s1, 2: s2})

    def test_no_matches_is_typed_empty(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x y", "z"])
        out = q_bm25f_topk(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "score"]


class TestDupClusterHist:
    def test_known_histogram(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["a", "a", "a", "b", "b", "c"])
        out = q_dup_cluster_hist(sf)
        assert out["size"].tolist() == [1, 2, 3]
        assert out["n_clusters"].tolist() == [1, 1, 1]

    def test_all_unique(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["a", "b", "c"])
        out = q_dup_cluster_hist(sf)
        assert out["size"].tolist() == [1]
        assert out["n_clusters"].tolist() == [3]


class TestBigramXent:
    def test_known_cross_entropy(self, ray_session, tmp_sf):
        # cab(a,b)=1, cab(a,c)=1, ca(a)=2, V=3
        # xent = -ln((1+1)/(2+3)) = ln(2.5) for both docs
        sf = _docs(tmp_sf, ["a b", "a c"])
        out = q_bigram_xent(sf)
        want = round(math.log(2.5), 6)
        assert out["doc_id"].tolist() == [1, 2]
        assert out["xent"].tolist() == [want, want]

    def test_repeated_bigram_weighting(self, ray_session, tmp_sf):
        # doc1 repeats (a,a): per-doc mean weights by occurrence count
        sf = _docs(tmp_sf, ["a a a", "a b"])
        out = q_bigram_xent(sf)
        # cab(a,a)=2, cab(a,b)=1, ca(a)=3, V=2
        x1 = round(-math.log((2 + 1) / (3 + 2)), 6)
        x2 = round(-math.log((1 + 1) / (3 + 2)), 6)
        got = dict(zip(out["doc_id"], out["xent"]))
        assert got == {1: x1, 2: x2}
        assert out["doc_id"].tolist()[0] == 2  # rarer bigram ranks first

    def test_single_token_docs_excluded(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["a", "b"])
        out = q_bigram_xent(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "xent"]


class TestMaxPassage:
    def test_best_passage_wins_and_is_reported(self, ray_session,
                                               tmp_sf):
        # doc1: chunk0 = 'data' + 49 fillers (tf=1, plen=50);
        # chunk1 = 'data data' (tf=2, plen=2) — denser, must win.
        sf = _docs(tmp_sf, [
            "data " + "x " * 49 + "data data", "y z"])
        out = q_max_passage_topk(sf)
        n_p, avgpl = 3.0, (50 + 2 + 2) / 3.0
        idf = math.log((n_p - 2 + 0.5) / (2 + 0.5) + 1.0)
        s0 = round(idf * 1 * (K1 + 1)
                   / (1 + K1 * (1 - B + B * 50 / avgpl)), 6)
        s1 = round(idf * 2 * (K1 + 1)
                   / (2 + K1 * (1 - B + B * 2 / avgpl)), 6)
        assert s1 > s0
        assert out["doc_id"].tolist() == [1]
        assert out["chunk"].tolist() == [1]
        assert out["score"].tolist() == [s1]

    def test_passage_tie_picks_smaller_chunk(self, ray_session,
                                             tmp_sf):
        one = "data " + "x " * (_PASSAGE_LEN - 2) + "y "
        sf = _docs(tmp_sf, [one + one])  # two identical passages
        out = q_max_passage_topk(sf)
        assert out["doc_id"].tolist() == [1]
        assert out["chunk"].tolist() == [0]

    def test_no_matches_is_typed_empty(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x y", "z"])
        out = q_max_passage_topk(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "chunk", "score"]


class TestSnippetWindow:
    def test_densest_window_wins(self, ray_session, tmp_sf):
        # positions (1-based): data@1, join@12 stream@13 data@14 —
        # window [12, 22) holds 3 hits; [1, 11) holds only 1
        sf = _docs(tmp_sf, [
            "data " + "x " * 10 + "join stream data",
            "y z"])
        out = q_snippet_window(sf)
        assert out["doc_id"].tolist() == [1]
        assert out["win_start"].tolist() == [12]
        assert out["n_hits"].tolist() == [3]

    def test_tie_prefers_earlier_start(self, ray_session, tmp_sf):
        # two isolated single hits: both windows hold 1 hit; the
        # earlier start must win
        sf = _docs(tmp_sf, ["data " + "x " * 20 + "join y"])
        out = q_snippet_window(sf)
        assert out["win_start"].tolist() == [1]
        assert out["n_hits"].tolist() == [1]

    def test_no_hits_is_typed_empty(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x y"])
        out = q_snippet_window(sf)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "win_start", "n_hits"]


class TestSamplePerGroup:
    def test_quota_and_determinism(self, ray_session, tmp_sf):
        import pyarrow as pa
        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(["t"] * 40, pa.string()),
            "source": pa.array(
                [f"s{i % 2}" for i in range(40)], pa.string()),
        }))
        out1 = q_sample_exact_n_per_group(sf)
        out2 = q_sample_exact_n_per_group(sf)
        assert out1.equals(out2)  # deterministic re-run
        counts = out1.groupby("source")["doc_id"].count()
        assert counts.to_dict() == {"s0": 5, "s1": 5}
