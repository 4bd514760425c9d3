"""Unit tests: duplicate-span mining, repetition signals, exact
distributed quantiles, and the DuckDB-parity rounding helper."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


class TestDupSpans:
    def _run(self, ds, **kw):
        from modernsearchengines_ray.stages.spans import dup_span_stats

        out = dup_span_stats(ds, n=8, **kw).to_pandas()
        return out.set_index("doc_id").sort_index()

    def test_planted_cross_doc_span(self, ray_session):
        # A and B share one 8-word span; C is unique; D is too short.
        ds = _docs_ds([
            (1, SHARED + " one two three"),
            (2, "x y " + SHARED),
            (3, "entirely different words with no overlap at all here"),
            (4, "too short"),
        ])
        out = self._run(ds)
        assert len(out) == 4
        # doc1: 11 words -> 4 spans; exactly 1 (the shared gram) dup
        assert out.loc[1, "n_spans"] == 4
        assert out.loc[1, "dup_spans"] == 1
        assert out.loc[1, "dup_span_ratio"] == 0.25
        # doc2: 10 words -> 3 spans, 1 dup
        assert out.loc[2, "n_spans"] == 3
        assert out.loc[2, "dup_spans"] == 1
        # doc3: 9 words -> 2 spans, 0 dup
        assert out.loc[3, "n_spans"] == 2
        assert out.loc[3, "dup_spans"] == 0
        assert out.loc[3, "dup_span_ratio"] == 0.0
        # doc4: <8 words -> zero row survives
        assert out.loc[4, "n_spans"] == 0
        assert out.loc[4, "dup_span_ratio"] == 0.0

    def test_within_doc_repeat_is_not_cross_doc_dup(self, ray_session):
        # the same gram twice in ONE doc is not duplication (needs >=2
        # distinct docs)...
        ds = _docs_ds([(1, SHARED + " filler " + SHARED)])
        out = self._run(ds)
        assert out.loc[1, "dup_spans"] == 0
        # ...but both occurrences count once another doc has it
        ds2 = _docs_ds([(1, SHARED + " filler " + SHARED), (2, SHARED)])
        out2 = self._run(ds2)
        assert out2.loc[1, "dup_spans"] == 2
        assert out2.loc[2, "dup_spans"] == 1

    def test_hash64_key_parity(self, ray_session):
        ds = _docs_ds([
            (1, SHARED + " one two three"),
            (2, "x y " + SHARED),
            (3, "entirely different words with no overlap at all here"),
        ])
        a = self._run(ds)
        b = self._run(ds, key="hash64")
        assert a.equals(b)

    def test_bad_key_raises(self, ray_session):
        from modernsearchengines_ray.stages.spans import dup_span_stats

        with pytest.raises(ValueError):
            dup_span_stats(_docs_ds([(1, "a")]), key="nope")


class TestRepetitionStats:
    def test_hand_checked(self):
        from modernsearchengines_ray.functions.quality import (
            repetition_stats)

        r = repetition_stats("the cat sat. the cat sat on a mat")
        assert r["top_2gram_char_frac"] == pytest.approx(0.5)
        assert r["top_3gram_char_frac"] == pytest.approx(0.75)
        assert r["dup_5gram_char_frac"] == 0.0

        r = repetition_stats("a b c d e a b c d e x")
        assert r["dup_5gram_char_frac"] == pytest.approx(10 / 11)

    def test_degenerate_inputs(self):
        from modernsearchengines_ray.functions.quality import (
            repetition_stats)

        for text in ("", "   ", "!!!", "one"):
            r = repetition_stats(text)
            assert set(r.values()) == {0.0}

    def test_overlap_counted_once(self):
        from modernsearchengines_ray.functions.quality import (
            repetition_stats)

        # "a a a a a a" : every 5-gram is (a a a a a), duplicated;
        # coverage is all 6 positions once, not 2x5 positions
        r = repetition_stats("a a a a a a")
        assert r["dup_5gram_char_frac"] == 1.0


class TestRoundHalfAway:
    def test_matches_duckdb_semantics(self):
        import duckdb

        from modernsearchengines_ray.pipelines.driver_queries import (
            _round_half_away)

        con = duckdb.connect()
        # dyadic halves where Python's round() banks the other way
        for v in (17 / 128, -17 / 128, 2.5e-6, -2.5e-6, 0.1234565,
                  0.0, 1.0):
            want = con.execute(
                "SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]
            assert _round_half_away(v) == want, v


class TestExactQuantiles:
    QS = (0.25, 0.5, 0.75, 0.9, 0.99)

    def _check(self, vals, bins=256):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        got = exact_quantiles(ds, "v", self.QS, bins=bins).to_pandas()
        srt = np.sort(np.asarray(vals, dtype=np.float64))
        for q, g in zip(self.QS, got["value"]):
            want = srt[int(np.floor((len(srt) - 1) * q))]
            assert g == want, (q, g, want)

    def test_random(self, ray_session):
        rng = np.random.default_rng(7)
        self._check(rng.normal(100.0, 25.0, size=10_000).tolist())

    def test_skewed_duplicates(self, ray_session):
        rng = np.random.default_rng(11)
        vals = np.concatenate([
            np.full(5_000, 42.0),  # hot value concentrates one bin
            rng.uniform(0.0, 1000.0, 2_000)])
        self._check(vals.tolist())

    def test_constant_column(self, ray_session):
        self._check([7.5] * 100)

    def test_empty_returns_nulls(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
        got = exact_quantiles(ds, "v", self.QS)
        assert got["value"].null_count == len(self.QS)

    def test_candidate_guard_raises(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        ds = rd.from_arrow(pa.table(
            {"v": pa.array(np.arange(1000.0), pa.float64())}))
        with pytest.raises(ValueError, match="max_candidate_rows"):
            exact_quantiles(ds, "v", (0.5,), bins=2,
                            max_candidate_rows=10)

    def test_nulls_excluded(self, ray_session):
        # ADVICE r3: 1..100 plus 50 nulls must give median 50, not 75
        # (stock Count() counted the nulls and inflated the ranks)
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        vals = list(np.arange(1.0, 101.0)) + [None] * 50
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        got = exact_quantiles(ds, "v", (0.5,), bins=64).to_pandas()
        assert float(got["value"].iloc[0]) == 50.0

    def test_all_null_returns_nulls(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        ds = rd.from_arrow(pa.table(
            {"v": pa.array([None, None], pa.float64())}))
        got = exact_quantiles(ds, "v", self.QS)
        assert got["value"].null_count == len(self.QS)


class TestInterpolatedQuantiles:
    """exact_quantiles(interpolate=True) == SQL percentile_cont:
    v_lo + frac*(v_hi - v_lo) over the neighbouring order
    statistics, written in exactly that operation order."""

    QS = (0.1, 0.25, 0.5, 0.75, 0.9)

    def _want(self, vals, q):
        srt = np.sort(np.asarray(vals, dtype=np.float64))
        h = (len(srt) - 1) * q
        k = int(np.floor(h))
        frac = h - np.floor(h)
        if frac == 0 or k + 1 >= len(srt):
            return float(srt[k])
        return float(srt[k] + frac * (srt[k + 1] - srt[k]))

    def _check(self, vals, bins=256):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        got = exact_quantiles(ds, "v", self.QS, bins=bins,
                              interpolate=True).to_pandas()
        for q, g in zip(self.QS, got["value"]):
            assert g == self._want(vals, q), (q, g)
            # sanity vs numpy's linear method (same definition,
            # possibly different fp op order)
            assert abs(g - np.quantile(np.asarray(vals, np.float64),
                                       q)) < 1e-9

    def test_random(self, ray_session):
        rng = np.random.default_rng(3)
        self._check(rng.normal(50.0, 9.0, size=5_001).tolist())

    def test_frac_zero_hits_element(self, ray_session):
        # n=5: (n-1)*q integral for every q in {0.25,0.5,0.75}
        self._check([5.0, 1.0, 4.0, 2.0, 3.0])

    def test_neighbour_in_next_bin(self, ray_session):
        # two clusters so v_k and v_{k+1} land in different bins
        vals = [0.0] * 50 + [1000.0] * 50
        self._check(vals, bins=16)

    def test_matches_duckdb_percentile_formula(self, ray_session):
        import duckdb
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles)

        rng = np.random.default_rng(13)
        vals = rng.uniform(0.0, 1e5, size=2_000)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        got = exact_quantiles(ds, "v", (0.5,), interpolate=True) \
            .to_pandas()["value"][0]
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        want = con.execute(
            "SELECT a.v + ((n - 1) * 0.5 - floor((n - 1) * 0.5))"
            "       * (b.v - a.v) "
            "FROM (SELECT v, row_number() OVER (ORDER BY v) rn,"
            "             count(*) OVER () n FROM t) a "
            "JOIN (SELECT v, row_number() OVER (ORDER BY v) rn"
            "      FROM t) b ON b.rn = a.rn + 1 "
            "WHERE a.rn = CAST(floor((a.n - 1) * 0.5) AS BIGINT) + 1"
        ).fetchone()[0]
        assert got == want


class TestExactQuantilesByGroup:
    QS = (0.25, 0.5, 0.9)

    def test_matches_per_group_numpy(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles_by_group)

        rng = np.random.default_rng(13)
        groups = rng.choice(["a", "b", "c"], size=6_000).tolist()
        vals = rng.normal(50.0, 20.0, size=6_000)
        ds = rd.from_arrow(pa.table({
            "g": pa.array(groups, pa.string()),
            "v": pa.array(vals, pa.float64()),
        }))
        got = exact_quantiles_by_group(
            ds, "v", "g", self.QS, bins=128).to_pandas()
        for g in ("a", "b", "c"):
            srt = np.sort(vals[np.asarray(groups) == g])
            for q in self.QS:
                want = srt[int(np.floor((len(srt) - 1) * q))]
                row = got[(got["g"] == g) & (got["q"] == q)]
                assert float(row["value"].iloc[0]) == want, (g, q)

    def test_skewed_group_sizes(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles_by_group)

        vals = list(range(1000)) + [5.0, 6.0, 7.0]
        groups = ["big"] * 1000 + ["tiny"] * 3
        ds = rd.from_arrow(pa.table({
            "g": pa.array(groups, pa.string()),
            "v": pa.array([float(v) for v in vals], pa.float64()),
        }))
        got = exact_quantiles_by_group(
            ds, "v", "g", (0.5,), bins=64).to_pandas()
        assert float(got[got["g"] == "tiny"]["value"].iloc[0]) == 6.0
        assert float(got[got["g"] == "big"]["value"].iloc[0]) == 499.0

    def test_nulls_excluded_per_group(self, ray_session):
        # ADVICE r3: NaN/null values corrupted per-group histograms
        # (floor(NaN) -> INT64_MIN -> clipped into bin 0)
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            exact_quantiles_by_group)

        vals = ([float(v) for v in range(1, 101)] + [None] * 50
                + [10.0, None, 20.0, 30.0])
        groups = ["a"] * 150 + ["b"] * 4
        ds = rd.from_arrow(pa.table({
            "g": pa.array(groups, pa.string()),
            "v": pa.array(vals, pa.float64()),
        }))
        got = exact_quantiles_by_group(
            ds, "v", "g", (0.5,), bins=64).to_pandas()
        assert float(got[got["g"] == "a"]["value"].iloc[0]) == 50.0
        assert float(got[got["g"] == "b"]["value"].iloc[0]) == 20.0


class TestApproxQuantilesKMV:
    """One-pass mergeable quantile sketch: the properties the driver
    gate (quantile_sketch_check) can't pin — partitioning invariance,
    sample-exactness at k >= n, and the rank-error bound."""

    @staticmethod
    def _data(n, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table({
            "rid": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "v": pa.array(rng.lognormal(3.0, 1.0, n), pa.float64()),
        })

    def test_partitioning_invariance_bit_identical(self, ray_session):
        # the sample is a deterministic function of the DATA (bottom-k
        # of a bijective hash), so any block layout gives the same
        # estimates bit-for-bit
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            approx_quantiles_kmv)

        tab = self._data(20_000)
        outs = []
        for blocks in (1, 7, 32):
            ds = rd.from_arrow(tab).repartition(blocks)
            outs.append(approx_quantiles_kmv(
                ds, "v", "rid", (0.1, 0.5, 0.9), k=512).to_pandas())
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])

    def test_exact_when_k_covers_input(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            approx_quantiles_kmv, exact_quantiles)

        tab = self._data(1000)
        ds = rd.from_arrow(tab).repartition(5)
        approx = approx_quantiles_kmv(
            ds, "v", "rid", (0.25, 0.5, 0.75), k=2000).to_pandas()
        exact = exact_quantiles(
            ds, "v", (0.25, 0.5, 0.75)).to_pandas()
        pd.testing.assert_frame_equal(approx, exact)

    def test_rank_error_within_bound(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            approx_quantiles_kmv)

        k = 1024
        tab = self._data(50_000)
        ds = rd.from_arrow(tab).repartition(16)
        got = approx_quantiles_kmv(
            ds, "v", "rid", (0.25, 0.5, 0.75), k=k).to_pandas()
        v = tab["v"].to_numpy()
        eps = 4.0 / np.sqrt(k)
        for _, row in got.iterrows():
            rank = float((v < row["value"]).sum()) / len(v)
            assert abs(rank - row["q"]) <= eps, (row["q"], rank)

    def test_nulls_excluded_and_empty(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            approx_quantiles_kmv)

        tab = pa.table({
            "rid": pa.array(np.arange(6, dtype=np.int64), pa.int64()),
            "v": pa.array([1.0, None, 2.0, None, 3.0, None],
                          pa.float64()),
        })
        got = approx_quantiles_kmv(
            rd.from_arrow(tab), "v", "rid", (0.5,), k=10).to_pandas()
        assert float(got["value"].iloc[0]) == 2.0

        empty = pa.table({
            "rid": pa.array([], pa.int64()),
            "v": pa.array([], pa.float64()),
        })
        got = approx_quantiles_kmv(
            rd.from_arrow(empty), "v", "rid", (0.5,), k=10).to_pandas()
        assert got["value"].isna().all()


class TestWeightedQuantiles:
    """stages/quantiles.py::weighted_quantiles — exact lower weighted
    quantiles via weight-mass histogram refinement."""

    def _brute(self, v, w, q):
        order = np.argsort(v, kind="stable")
        v, w = np.asarray(v)[order], np.asarray(w)[order]
        cum = np.cumsum(w)
        t = q * cum[-1]
        return float(v[int(np.searchsorted(cum, t, side="left"))])

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            weighted_quantiles)

        rng = np.random.default_rng(7)
        v = rng.uniform(0, 1000, 5000)
        w = rng.integers(1, 50, 5000).astype(np.float64)
        ds = rd.from_arrow(pa.table({"v": v, "w": w})).repartition(9)
        got = weighted_quantiles(
            ds, "v", "w", (0.1, 0.25, 0.5, 0.75, 0.9)).to_pandas()
        for _, row in got.iterrows():
            assert row["value"] == self._brute(v, w, row["q"]), row["q"]

    def test_weights_shift_the_median(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            weighted_quantiles)

        # values 1..9 uniform weight -> median 5; weight 100 on 9
        # drags the weighted median to 9
        v = np.arange(1.0, 10.0)
        w = np.ones(9)
        w[-1] = 100.0
        ds = rd.from_arrow(pa.table({"v": v, "w": w}))
        got = weighted_quantiles(ds, "v", "w", (0.5,)).to_pandas()
        assert float(got["value"].iloc[0]) == 9.0

    def test_nulls_and_zero_weights_excluded(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            weighted_quantiles)

        # null value, null weight, and sub-1 scaled weight rows must
        # all drop out (the ADVICE r3 Count-vs-histogram desync class)
        tab = pa.table({
            "v": pa.array([1.0, None, 2.0, 3.0, 1000.0, 4.0],
                          pa.float64()),
            "w": pa.array([1.0, 5.0, None, 1.0, 0.4, 1.0],
                          pa.float64()),
        })
        got = weighted_quantiles(
            rd.from_arrow(tab), "v", "w", (0.5,)).to_pandas()
        # surviving (v, w): (1,1) (3,1) (4,1) -> t=1.5 -> v=3
        assert float(got["value"].iloc[0]) == 3.0

    def test_empty_and_constant(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            weighted_quantiles)

        empty = pa.table({"v": pa.array([], pa.float64()),
                          "w": pa.array([], pa.float64())})
        got = weighted_quantiles(
            rd.from_arrow(empty), "v", "w", (0.5,)).to_pandas()
        assert got["value"].isna().all()

        const = pa.table({"v": pa.array([7.0] * 5, pa.float64()),
                          "w": pa.array([2.0] * 5, pa.float64())})
        got = weighted_quantiles(
            rd.from_arrow(const), "v", "w", (0.25, 0.9)).to_pandas()
        assert (got["value"] == 7.0).all()

    def test_rejects_q_zero(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.quantiles import (
            weighted_quantiles)

        ds = rd.from_arrow(pa.table({"v": pa.array([1.0]),
                                     "w": pa.array([1.0])}))
        with pytest.raises(ValueError):
            weighted_quantiles(ds, "v", "w", (0.0, 0.5))
