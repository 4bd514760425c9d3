"""Known-value edge tests for the round-5c additions (textrank,
varint gate, wildcard, spell correction, SAX, JL projection, sloppy
phrase, burstiness, dup-rate).  The SQL-parity gate runs in
test_driver_queries; these pin the math and the empty/degenerate
behavior on hand-built inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines.driver_queries import (
    _RP_OUT_DIM,
    _rp_signs,
    q_dup_rate_by_source,
    q_phrase_slop,
    q_postings_varint_check,
    q_rp_embed,
    q_sax_events,
    q_spell_correct,
    q_term_burstiness,
    q_textrank_keywords,
    q_wildcard_search,
)


@pytest.fixture()
def tmp_sf(tmp_path):
    def write(table: str, tab: pa.Table):
        pq.write_table(tab, tmp_path / f"{table}.parquet")
        return str(tmp_path)
    return write


def _docs(tmp_sf, texts, sources=None):
    n = len(texts)
    tab = {"doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
           "text": pa.array(texts, pa.string())}
    if sources is not None:
        tab["source"] = pa.array(sources, pa.string())
    return tmp_sf("documents", pa.table(tab))


class TestPhraseSlop:
    def test_pairs_and_min_gap(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, [
            "data x stream",            # gap 2 -> 1 pair
            "data x y z stream",        # gap 4 > slop -> none
            "stream then data",         # reversed order -> none
            "data stream data stream",  # pairs (0,1)(0,3)(2,3) -> 3
        ])
        out = q_phrase_slop(sf).to_pandas().set_index("doc_id")
        assert sorted(out.index) == [1, 4]
        assert out.loc[1, "n_pairs"] == 1 and out.loc[1, "min_gap"] == 2
        assert out.loc[4, "n_pairs"] == 3 and out.loc[4, "min_gap"] == 1

    def test_empty_docs(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, [])
        assert q_phrase_slop(sf).count() == 0


class TestVarintGate:
    def test_known_sizes(self, ray_session, tmp_sf):
        # 'a' at positions [0, 2]: deltas [0, 2] -> 2 bytes;
        # 'b' at [1]: delta [1] -> 1 byte
        sf = _docs(tmp_sf, ["a b a"])
        out = q_postings_varint_check(sf).to_pandas() \
            .set_index("term")
        assert out.loc["a", "tf"] == 2
        assert out.loc["a", "pos_sum"] == 2
        assert out.loc["a", "first_pos"] == 0
        assert out.loc["a", "last_pos"] == 2
        assert out.loc["a", "pos_bytes"] == 2
        assert out.loc["b", "pos_bytes"] == 1

    def test_two_byte_gap(self, ray_session, tmp_sf):
        # position 130 alone: delta 130 >= 128 -> 2 bytes
        sf = _docs(tmp_sf, ["x " * 130 + "y"])
        out = q_postings_varint_check(sf).to_pandas() \
            .set_index("term")
        assert out.loc["y", "first_pos"] == 130
        assert out.loc["y", "pos_bytes"] == 2


class TestWildcard:
    def test_probe_matches(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["filter water", "order water park"])
        out = q_wildcard_search(sf).to_pandas()
        suf = out[out["pattern"] == "*er"].set_index("term")
        assert set(suf.index) == {"filter", "water", "order"}
        assert suf.loc["water", "df"] == 2
        inf = out[out["pattern"] == "*ar*"].set_index("term")
        assert set(inf.index) == {"park"}
        # df desc within pattern
        assert list(suf["df"]) == sorted(suf["df"], reverse=True)


class TestSpellCorrect:
    def test_distance_beats_df(self, ray_session, tmp_sf):
        # probe 'jion': lion is 1 edit (df 1), join is 2 edits (df 3)
        # -> lion wins on distance despite lower df
        sf = _docs(tmp_sf, ["join lion", "join", "join"])
        out = q_spell_correct(sf).to_pandas().set_index("probe")
        assert out.loc["jion", "term"] == "lion"
        assert out.loc["jion", "dist"] == 1

    def test_df_breaks_distance_tie(self, ray_session, tmp_sf):
        # 'tabel': table and tamed are both 2 edits; table has df 2
        sf = _docs(tmp_sf, ["table tamed", "table"])
        out = q_spell_correct(sf).to_pandas().set_index("probe")
        assert out.loc["tabel", "term"] == "table"
        assert out.loc["tabel", "df"] == 2

    def test_no_candidate_probe_absent(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["table"])
        out = q_spell_correct(sf).to_pandas()
        assert "zzzzzz" not in set(out["probe"])


class TestSax:
    def test_constant_series_is_all_c(self, ray_session, tmp_sf):
        ts = pa.array([np.datetime64(f"2024-01-0{d}T12:00:00", "us")
                       for d in (1, 2, 3, 4)], pa.timestamp("us"))
        sf = tmp_sf("events", pa.table({
            "event_type": pa.array(["view"] * 4, pa.string()),
            "ts": ts,
        }))
        out = q_sax_events(sf).to_pandas()
        # 4 observed days at S=8 -> segments (i*8)//4 = 0,2,4,6
        assert list(out["segment"]) == [0, 2, 4, 6]
        assert set(out["symbol"]) == {"c"}  # paa 0 everywhere (sd=0)
        assert set(out["paa"]) == {0.0}

    def test_step_series_symbols(self, ray_session, tmp_sf):
        # two days: counts 1 then 3 -> z = -1, +1 -> symbols a/d?
        # mean 2, sd 1 -> z -1 < -0.6745 -> 'a'; +1 >= 0.6745 -> 'd'
        rows_day1 = [np.datetime64("2024-01-01T00:00:00", "us")]
        rows_day2 = [np.datetime64("2024-01-02T00:00:00", "us")] * 3
        sf = tmp_sf("events", pa.table({
            "event_type": pa.array(["v"] * 4, pa.string()),
            "ts": pa.array(rows_day1 + rows_day2, pa.timestamp("us")),
        }))
        out = q_sax_events(sf).to_pandas().set_index("segment")
        assert out.loc[0, "symbol"] == "a"
        assert out.loc[4, "symbol"] == "d"


class TestRpEmbed:
    def test_unit_vector_reads_sign_row(self, ray_session, tmp_sf):
        dim = 8
        e = np.zeros(dim)
        e[2] = 4.0  # -> row 3 (1-based dim) of the sign matrix, x4/sqrt(k)
        sf = tmp_sf("embeddings", pa.table({
            "vec_id": pa.array([7], pa.int64()),
            "embedding": pa.array([list(e)], pa.list_(pa.float32())),
        }))
        out = q_rp_embed(sf).to_pandas()
        signs = _rp_signs(dim, _RP_OUT_DIM)
        want = signs[2] * 4.0 / np.sqrt(_RP_OUT_DIM)
        assert np.allclose(out["val"].to_numpy(), np.round(want, 6))

    def test_sign_matrix_deterministic(self):
        a = _rp_signs(64, _RP_OUT_DIM)
        b = _rp_signs(64, _RP_OUT_DIM)
        assert np.array_equal(a, b)
        assert set(np.unique(a)) == {-1.0, 1.0}


class TestBurstiness:
    def test_known_ratios(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["a a b", "a"])
        out = q_term_burstiness(sf).to_pandas().set_index("term")
        assert out.loc["a", "cf"] == 3 and out.loc["a", "df"] == 2
        assert out.loc["a", "burstiness"] == 1.5
        assert out.loc["b", "burstiness"] == 1.0
        # bursty term sorts first
        assert list(out.index)[0] == "a"


class TestDupRate:
    def test_cross_source_multiplicity(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["x", "x", "x", "y"],
                   sources=["s1", "s1", "s2", "s2"])
        out = q_dup_rate_by_source(sf).to_pandas().set_index("source")
        assert out.loc["s1", "dup_rate"] == 1.0
        assert out.loc["s2", "docs"] == 2
        assert out.loc["s2", "dups"] == 1
        assert out.loc["s2", "dup_rate"] == 0.5


class TestEmptyCorpus:
    def test_textrank_and_dup_rate_empty(self, ray_session, tmp_sf):
        # both entries feed hash joins whose inputs would otherwise be
        # schema-less empties (the documented Acero failure)
        sf = _docs(tmp_sf, [], sources=[])
        assert q_textrank_keywords(sf).count() == 0
        assert q_dup_rate_by_source(sf).count() == 0


class TestTextrank:
    def test_hub_word_ranks_first(self, ray_session, tmp_sf):
        sf = _docs(tmp_sf, ["alpha beta", "beta gamma",
                            "beta delta", "delta beta"])
        out = q_textrank_keywords(sf).to_pandas()
        assert out.iloc[0]["term"] == "beta"  # highest-degree hub
        assert list(out["rank"]) == sorted(out["rank"], reverse=True)
