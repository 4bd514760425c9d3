"""Window-function semantics on hand-built inputs (the SQL parity
gate runs in test_driver_queries); pins what the events table never
stresses: cross-block stitching with MANY tiny blocks, a hot key
spanning every block, lag across block boundaries, and cross-tier
bit-parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.windows import window_functions

US = 1_000_000


def _make_events(n_rows: int, n_keys: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n_rows)
    ts = rng.integers(0, n_rows * 10, n_rows) * US
    ids = np.arange(n_rows, dtype=np.int64)  # unique tie-break
    values = np.round(rng.normal(10.0, 5.0, n_rows), 4)
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(keys.astype(np.int64), pa.int64()),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        "value": pa.array(values, pa.float64()),
    })


def _pandas_oracle(tab: pa.Table, scale: float = 1000.0) -> pd.DataFrame:
    df = tab.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "ts_us", "event_id"],
                        kind="mergesort", ignore_index=True)
    g = df.groupby("user_id", sort=False)
    df["rn"] = g.cumcount() + 1
    df["run_sum_scaled"] = (
        np.floor(df["value"] * scale).astype("int64")
        .groupby(df["user_id"], sort=False).cumsum())
    prev = g["value"].shift(1)
    df["has_prev"] = prev.notna()
    df["prev_value"] = prev.fillna(0.0)
    out = df[["event_id", "user_id", "ts_us", "rn", "run_sum_scaled",
              "prev_value", "has_prev"]].rename(
                  columns={"event_id": "id", "user_id": "key"})
    return out.sort_values("id", ignore_index=True)


def _run(tab: pa.Table, reduce: str, n_blocks: int = 12) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_arrow(tab).repartition(n_blocks)
    out = window_functions(ds, key_col="user_id", ts_col="ts",
                           id_col="event_id", value_col="value",
                           reduce=reduce)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out.to_pandas()
    return df.sort_values("id", ignore_index=True)


class TestWindowFunctions:
    def test_matches_pandas_oracle_many_blocks(self, ray_session):
        tab = _make_events(3000, 40)
        got = _run(tab, "driver")
        want = _pandas_oracle(tab)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hot_key_spans_every_block(self, ray_session):
        # ONE key across 12 blocks: every row number / running sum /
        # lag except the first block's depends on the stitch
        tab = _make_events(2000, 1)
        got = _run(tab, "driver")
        want = _pandas_oracle(tab)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["rn"].max() == 2000

    def test_tier_parity_bit_identical(self, ray_session):
        tab = _make_events(3000, 17)
        a = _run(tab, "driver")
        b = _run(tab, "partitioned")
        pd.testing.assert_frame_equal(a, b)

    def test_lag_crosses_block_boundary(self, ray_session):
        # 2 keys, interleaved, sorted input split into 8 blocks: the
        # first row of each later block must take its prev from the
        # previous block's last row of the SAME key
        n = 64
        tab = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array((np.arange(n) % 2).astype(np.int64)),
            "ts": pa.array(np.arange(n) * US, pa.timestamp("us")),
            "value": pa.array(np.arange(n, dtype=np.float64) + 0.5),
        })
        got = _run(tab, "driver", n_blocks=8)
        want = _pandas_oracle(tab)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # every row but each key's first has a prev
        assert int((~got["has_prev"]).sum()) == 2

    def test_empty_input(self, ray_session):
        tab = _make_events(0, 1)
        got = _run(tab, "driver", n_blocks=1)
        assert len(got) == 0
        assert list(got.columns) == ["id", "key", "ts_us", "rn",
                                     "run_sum_scaled", "prev_value",
                                     "has_prev"]

    def test_unknown_reduce_raises(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_make_events(10, 2))
        with pytest.raises(ValueError):
            window_functions(ds, "user_id", "ts", "event_id", "value",
                             reduce="nope")


class TestMovingWindowSum:
    """Moving w-row window (the SQL parity gate runs in
    test_driver_queries): pandas-rolling parity across many tiny
    blocks (forcing the short-segment chain path), hot keys, larger
    w, and tier parity."""

    @staticmethod
    def _oracle(tab: pa.Table, w: int, scale: float = 1000.0):
        df = tab.to_pandas()
        df["ts_us"] = df["ts"].astype("int64")
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort", ignore_index=True)
        v = np.floor(df["value"] * scale).astype("int64")
        g = df.groupby("user_id", sort=False)
        df["rn"] = g.cumcount() + 1
        df["win_sum_scaled"] = (
            v.groupby(df["user_id"], sort=False)
            .rolling(w, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype("int64"))
        df["win_n"] = np.minimum(df["rn"], w)
        out = df[["event_id", "user_id", "ts_us", "rn",
                  "win_sum_scaled", "win_n"]].rename(
                      columns={"event_id": "id", "user_id": "key"})
        return out.sort_values("id", ignore_index=True)

    @staticmethod
    def _run(tab: pa.Table, w: int, reduce: str, blocks: int = 12):
        import ray.data as rd

        from modernsearchengines_ray.stages.windows import (
            moving_window_sum)

        ds = rd.from_arrow(tab).repartition(blocks)
        out = moving_window_sum(ds, "user_id", "ts", "event_id",
                                "value", w=w, reduce=reduce)
        df = out.to_pandas()
        return df.sort_values("id", ignore_index=True)

    def test_matches_pandas_rolling(self, ray_session):
        tab = _make_events(3000, 40)
        got = self._run(tab, 3, "driver")
        want = self._oracle(tab, 3)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tiny_blocks_force_chain_path(self, ray_session):
        # 60 rows over 30 blocks: segments of 1-2 rows, so prefix
        # tails must chain across MULTIPLE summaries
        tab = _make_events(60, 3, seed=13)
        got = self._run(tab, 4, "driver", blocks=30)
        want = self._oracle(tab, 4)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hot_key_and_larger_w(self, ray_session):
        tab = _make_events(1500, 1, seed=9)
        got = self._run(tab, 6, "driver")
        want = self._oracle(tab, 6)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tier_parity_bit_identical(self, ray_session):
        tab = _make_events(2000, 11)
        a = self._run(tab, 3, "driver")
        b = self._run(tab, 3, "partitioned")
        pd.testing.assert_frame_equal(a, b)

    def test_w_validation(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.windows import (
            moving_window_sum)

        with pytest.raises(ValueError):
            moving_window_sum(rd.from_arrow(_make_events(5, 1)),
                              "user_id", "ts", "event_id", "value",
                              w=1)
