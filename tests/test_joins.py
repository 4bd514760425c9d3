"""As-of and interval join semantics on hand-built inputs (the SQL
parity gate runs in test_driver_queries); pins the cases the events
table never hits: equal-timestamp inclusivity, never-matched keys,
multi-window overlap, and cross-tier bit-parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.joins import (
    asof_join_backward, interval_join,
)

US = 1_000_000


def _events(rows, value=False):
    cols = {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
    }
    if value:
        cols["value"] = pa.array([r[3] for r in rows], pa.float64())
    return pa.table(cols)


def _run_asof(left_rows, right_rows, reduce="driver"):
    import ray.data as rd

    res = asof_join_backward(
        rd.from_arrow(_events(left_rows)),
        rd.from_arrow(_events(right_rows, value=True)),
        key_col="user_id", ts_col="ts", left_id_col="event_id",
        right_value_col="value", reduce=reduce)
    df = res.to_pandas()
    return df.sort_values("left_id", ignore_index=True)


class TestAsofJoin:
    def test_backward_inclusive_at_equal_ts(self, ray_session):
        # right at EXACTLY the left ts must match (l.ts >= r.ts)
        out = _run_asof([(1, 7, 100)], [(9, 7, 100, 2.5)])
        assert out.loc[0, "matched"]
        assert out.loc[0, "r_ts_us"] == 100 * US
        assert out.loc[0, "r_value"] == 2.5

    def test_picks_latest_prior_not_first(self, ray_session):
        out = _run_asof([(1, 7, 100)],
                        [(8, 7, 50, 1.0), (9, 7, 90, 2.0), (10, 7, 150, 3.0)])
        assert out.loc[0, "r_ts_us"] == 90 * US
        assert out.loc[0, "r_value"] == 2.0

    def test_unmatched_and_cross_user_isolation(self, ray_session):
        # user 7 has only a FUTURE right; user 8's rights must not leak
        out = _run_asof([(1, 7, 100), (2, 8, 100)],
                        [(9, 7, 200, 9.0), (10, 8, 40, 4.0)])
        assert not out.loc[0, "matched"]
        assert out.loc[0, "r_ts_us"] == -1
        assert out.loc[1, "matched"]
        assert out.loc[1, "r_value"] == 4.0

    def test_tier_parity_many_blocks(self, ray_session):
        # enough rows that the sort produces multiple blocks and the
        # stitch actually crosses block boundaries
        rng = np.random.RandomState(7)
        left = [(i, int(rng.randint(5)), int(rng.randint(1000)))
                for i in range(300)]
        right = [(1000 + i, int(rng.randint(5)), int(rng.randint(1000)),
                  float(i)) for i in range(300)]
        a = _run_asof(left, right, reduce="driver")
        b = _run_asof(left, right, reduce="partitioned")
        pd.testing.assert_frame_equal(a, b)

    def test_driver_matches_pandas_merge_asof(self, ray_session):
        rng = np.random.RandomState(11)
        left = [(i, int(rng.randint(3)), int(rng.randint(500)))
                for i in range(120)]
        right = sorted(
            {(int(rng.randint(3)), int(rng.randint(500))) for _ in range(80)})
        right = [(5000 + i, u, t, float(u * 1000 + t))
                 for i, (u, t) in enumerate(right)]
        got = _run_asof(left, right)
        ldf = pd.DataFrame(left, columns=["event_id", "user_id", "t"]) \
            .sort_values("t", kind="mergesort")
        rdf = pd.DataFrame(right,
                           columns=["rid", "user_id", "t", "value"]) \
            .sort_values("t", kind="mergesort")
        want = pd.merge_asof(ldf, rdf, on="t", by="user_id",
                             direction="backward") \
            .sort_values("event_id", ignore_index=True)
        got = got.sort_values("left_id", ignore_index=True)
        matched = want["value"].notna()
        assert (got["matched"] == matched.to_numpy()).all()
        assert np.allclose(got.loc[matched, "r_value"],
                           want.loc[matched, "value"])

    def test_duplicate_key_ts_tiebreak_deterministic(self, ray_session):
        # ADVICE r3: duplicate (key, ts) right rows used to resolve by
        # physical sort order; the value-as-final-sort-key tie-break
        # makes max(value) win on BOTH tiers, partitioning-independent
        left = [(1, 7, 100), (2, 7, 300)]
        right = [(8, 7, 100, 1.0), (9, 7, 100, 5.0), (10, 7, 100, 3.0)]
        for reduce in ("driver", "partitioned"):
            out = _run_asof(left, right, reduce=reduce)
            assert out["matched"].all(), reduce
            assert (out["r_value"] == 5.0).all(), reduce

    def test_unknown_reduce_mode_raises(self, ray_session):
        import ray.data as rd

        with pytest.raises(ValueError):
            asof_join_backward(
                rd.from_arrow(_events([(1, 1, 1)])),
                rd.from_arrow(_events([(2, 1, 1, 0.0)], value=True)),
                key_col="user_id", ts_col="ts", left_id_col="event_id",
                right_value_col="value", reduce="bogus")


class TestIntervalJoin:
    def test_overlapping_windows_multi_match(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_events([(1, 0, 10), (2, 0, 14), (3, 0, 99)]))
        intervals = pa.table({
            "window_id": pa.array([0, 1], pa.int64()),
            "lo_us": pa.array([0, 12 * US], pa.int64()),
            "hi_us": pa.array([15 * US, 30 * US], pa.int64()),
        })
        out = interval_join(ds, intervals, ts_col="ts",
                            id_col="event_id").to_pandas()
        got = set(map(tuple, out[["event_id", "window_id"]].to_numpy()))
        # event 2 (t=14) falls in BOTH windows; event 3 in neither
        assert got == {(1, 0), (2, 0), (2, 1)}

    def test_half_open_boundaries(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_events([(1, 0, 5), (2, 0, 9)]))
        intervals = pa.table({
            "window_id": pa.array([0], pa.int64()),
            "lo_us": pa.array([5 * US], pa.int64()),
            "hi_us": pa.array([9 * US], pa.int64()),
        })
        out = interval_join(ds, intervals, ts_col="ts",
                            id_col="event_id").to_pandas()
        # lo inclusive, hi exclusive
        assert out["event_id"].tolist() == [1]


class TestIntervalJoinBucketed:
    def _random_fixture(self, seed=7, n_rows=400, n_iv=25):
        rng = np.random.RandomState(seed)
        rows = pa.table({
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
            "ts": pa.array(rng.randint(0, 1000, n_rows) * US,
                           pa.timestamp("us")),
        })
        lo = rng.randint(0, 950, n_iv) * US
        length = rng.randint(1, 120, n_iv) * US
        intervals = pa.table({
            "window_id": pa.array(np.arange(n_iv), pa.int64()),
            "lo_us": pa.array(lo, pa.int64()),
            "hi_us": pa.array(lo + length, pa.int64()),
        })
        return rows, intervals

    def test_parity_with_broadcast_tier(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        rows, intervals = self._random_fixture()
        ds = rd.from_arrow(rows)
        ref = interval_join(ds, intervals, ts_col="ts",
                            id_col="event_id").to_pandas()
        got = interval_join_bucketed(
            rd.from_arrow(rows), rd.from_arrow(intervals),
            ts_col="ts", id_col="event_id",
            bucket_us=64 * US, num_partitions=5).to_pandas()
        key = ["event_id", "window_id"]
        assert sorted(map(tuple, got[key].to_numpy())) == \
            sorted(map(tuple, ref[key].to_numpy()))
        # sanity: fixture intervals genuinely span multiple buckets
        assert len(ref) > 0

    def test_no_duplicate_emissions_across_buckets(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        # one interval spanning 4 buckets, rows in each bucket
        rows = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([5 * US, 15 * US, 25 * US, 35 * US],
                           pa.timestamp("us")),
        })
        intervals = pa.table({
            "window_id": pa.array([9], pa.int64()),
            "lo_us": pa.array([0], pa.int64()),
            "hi_us": pa.array([40 * US], pa.int64()),
        })
        out = interval_join_bucketed(
            rd.from_arrow(rows), rd.from_arrow(intervals),
            ts_col="ts", id_col="event_id",
            bucket_us=10 * US, num_partitions=3).to_pandas()
        assert sorted(out["event_id"].tolist()) == [1, 2, 3, 4]
        assert (out["window_id"] == 9).all()

    def test_replication_guard(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        rows = pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([0], pa.timestamp("us")),
        })
        intervals = pa.table({
            "window_id": pa.array([0], pa.int64()),
            "lo_us": pa.array([0], pa.int64()),
            "hi_us": pa.array([10_000 * US], pa.int64()),
        })
        # surfaces as a RayTaskError wrapping the ValueError
        with pytest.raises(Exception, match="bucket_us"):
            interval_join_bucketed(
                rd.from_arrow(rows), rd.from_arrow(intervals),
                ts_col="ts", id_col="event_id", bucket_us=US,
                num_partitions=2, max_buckets_per_interval=100,
            ).materialize()

    def test_empty_intervals_and_empty_rows(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        rows = pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([5 * US], pa.timestamp("us")),
        })
        # hi == lo interval matches nothing; and a rows-only run
        empty_iv = pa.table({
            "window_id": pa.array([0], pa.int64()),
            "lo_us": pa.array([5 * US], pa.int64()),
            "hi_us": pa.array([5 * US], pa.int64()),
        })
        out = interval_join_bucketed(
            rd.from_arrow(rows), rd.from_arrow(empty_iv),
            ts_col="ts", id_col="event_id",
            bucket_us=10 * US, num_partitions=2)
        # repo convention (test_empty_inputs): schema asserted at the
        # Dataset level — to_pandas flattens zero-row data to no columns
        assert out.count() == 0
        assert out.schema().names == ["event_id", "window_id"]


class TestSaltedJoin:
    def test_matches_unsalted_join_on_skewed_keys(self):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import salted_join

        # one hot key (0) holding 80% of the left rows
        n = 500
        keys = np.where(np.arange(n) % 5 == 0, np.arange(n) % 7, 0)
        left = pa.table({
            "k": pa.array(keys.astype(np.int64), pa.int64()),
            "row_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "x": pa.array(np.arange(n, dtype=np.float64), pa.float64()),
        })
        right = pa.table({
            "k": pa.array(np.arange(7, dtype=np.int64), pa.int64()),
            "name": pa.array([f"dim{i}" for i in range(7)], pa.string()),
        })
        out = salted_join(rd.from_arrow(left), rd.from_arrow(right),
                          on="k", salt_col="row_id", num_salts=4) \
            .to_pandas().sort_values("row_id").reset_index(drop=True)
        want = left.to_pandas().merge(right.to_pandas(), on="k") \
            .sort_values("row_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)], want[sorted(want.columns)])

    def test_salt_is_deterministic_and_dropped(self):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import salted_join

        left = pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "row_id": pa.array([10, 11, 12], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([100, 200], pa.int64()),
        })
        a = salted_join(rd.from_arrow(left), rd.from_arrow(right),
                        on="k", salt_col="row_id", num_salts=3).to_pandas()
        b = salted_join(rd.from_arrow(left), rd.from_arrow(right),
                        on="k", salt_col="row_id", num_salts=3).to_pandas()
        assert "__salt" not in a.columns
        pd.testing.assert_frame_equal(
            a.sort_values("row_id").reset_index(drop=True),
            b.sort_values("row_id").reset_index(drop=True))


class TestIntervalReplicationTelemetry:
    """VERDICT r4 #9: the bucketed tier's interval fan-out must be
    VISIBLE — one stats line per job (no-silent-caps rule)."""

    def _fixture(self):
        # 3 intervals over 10us buckets: spans of 4, 1 and 2 buckets
        # (the zero-length interval is dead and must not count)
        rows = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([5 * US, 25 * US], pa.timestamp("us")),
        })
        intervals = pa.table({
            "window_id": pa.array([0, 1, 2, 3], pa.int64()),
            "lo_us": pa.array([0, 12 * US, 18 * US, 7 * US],
                              pa.int64()),
            "hi_us": pa.array([31 * US, 13 * US, 21 * US, 7 * US],
                              pa.int64()),
        })
        return rows, intervals

    def test_stats_values(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_replication_stats,
        )

        _, intervals = self._fixture()
        stats = interval_replication_stats(rd.from_arrow(intervals),
                                           bucket_us=10 * US)
        # interval 0 -> buckets 0..3 (4), 1 -> bucket 1 (1),
        # 2 -> buckets 1..2 (2), 3 -> empty (dropped)
        assert stats == {"n_intervals": 3, "n_replicas": 7,
                         "max_buckets": 4,
                         "avg_replication": pytest.approx(7 / 3)}

    def test_join_logs_one_stats_line(self, ray_session, caplog):
        import logging

        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        rows, intervals = self._fixture()
        with caplog.at_level(logging.INFO, "modernsearchengines_ray"):
            interval_join_bucketed(
                rd.from_arrow(rows), rd.from_arrow(intervals),
                ts_col="ts", id_col="event_id", bucket_us=10 * US,
                num_partitions=2).to_pandas()
        lines = [r.getMessage() for r in caplog.records
                 if "interval_join_bucketed" in r.getMessage()]
        assert len(lines) == 1
        assert "3 intervals replicate to 7 bucket copies" in lines[0]
        assert "max 4 buckets" in lines[0]

    def test_telemetry_opt_out(self, ray_session, caplog):
        import logging

        import ray.data as rd

        from modernsearchengines_ray.stages.joins import (
            interval_join_bucketed,
        )

        rows, intervals = self._fixture()
        with caplog.at_level(logging.INFO, "modernsearchengines_ray"):
            interval_join_bucketed(
                rd.from_arrow(rows), rd.from_arrow(intervals),
                ts_col="ts", id_col="event_id", bucket_us=10 * US,
                num_partitions=2, telemetry=False).to_pandas()
        assert not [r for r in caplog.records
                    if "interval_join_bucketed" in r.getMessage()]
