"""VERDICT r4 #1 gate: the formerly per-entity ``map_groups`` driver
entries now run as ONE hash exchange (windows.keyed_blocks) plus a
vectorized per-block segment kernel.  This file pins both halves:

1. *no per-group Python dispatch* — the entry sources contain no
   ``map_groups`` call (the per-entity anti-pattern: a Python function
   + a pandas DataFrame construction per user/customer, #groups ×
   interpreter overhead at 10^8 entities);
2. *planted many-users correctness* — each entry over a synthetic
   corpus with MANY keys per block matches an independent brute-force
   pandas reference, including the entries' edge rules (debounce clock
   reset, SCD2 sentinel, RANGE-window ties) and time_window_sum's
   int64-overflow fallback (a 150-year timestamp spread forces the
   per-segment loop tier; values must not change).
"""

from __future__ import annotations

import inspect

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modernsearchengines_ray.pipelines import driver_queries as dq

VECTORIZED_ENTRIES = [
    dq.q_user_paths, dq.q_autocorr_by_user, dq.q_time_window_sum,
    dq.q_event_debounce, dq.q_reorder_gap_hist, dq.q_scd2_history,
    dq.q_conversion_latency, dq.q_events_ohlc, dq.q_fuzzy_join,
]


@pytest.mark.parametrize("fn", VECTORIZED_ENTRIES,
                         ids=lambda f: f.__name__)
def test_no_per_group_dispatch(fn):
    src = inspect.getsource(fn)
    assert "map_groups" not in src, \
        f"{fn.__name__} regressed to per-entity map_groups"


_N_USERS = 400
_TYPES = np.array(["view", "click", "purchase"])
_DAY_US = 86_400_000_000


def _planted_events(n_users: int, wide_ts: bool) -> pd.DataFrame:
    """Deterministic many-user event log: every user gets 1..8 events
    whose spacing straddles the entries' thresholds (debounce 24 h,
    RANGE window 1 h, equal-timestamp ties).  wide_ts stretches user
    base timestamps over ~150 years so time_window_sum's composite-key
    bound (#segments * stride >= 2^62) trips and the fallback runs."""
    rows = []
    eid = 0
    for u in range(n_users):
        n_ev = 1 + (u % 8)
        base = (u * 37) % 1000 * _DAY_US
        if wide_ts:
            base += (u % 97) * 48_000_000_000_000_000 // 97
        for k in range(n_ev):
            # mix sub-hour, sub-day and multi-day gaps + exact ties
            gap = [0, 1_000_000, 1_800_000_000, 3_600_000_000,
                   7_200_000_000, _DAY_US, 2 * _DAY_US, 0][k % 8]
            base += gap
            rows.append((eid, base, u, _TYPES[(u + k) % 3],
                         float((u * 13 + k * 7) % 29) - 5.0))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    return df


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("planted_sf")
    ev = _planted_events(_N_USERS, wide_ts=False)
    pq.write_table(pa.Table.from_pandas(
        ev[["event_id", "ts", "user_id", "event_type", "value"]],
        preserve_index=False), out / "events.parquet")
    n_orders = 1200
    ok = np.arange(n_orders, dtype=np.int64)
    od = pd.DataFrame({
        "o_orderkey": ok,
        "o_custkey": ok % 150,
        "o_totalprice": (ok % 700) * 13.25 + 900.0,
        "o_orderdate": ((ok * 11) % 365 * _DAY_US)
        .astype("datetime64[us]"),
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   out / "orders.parquet")
    return str(out)


@pytest.fixture(scope="module")
def wide_dir(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("wide_sf")
    ev = _planted_events(_N_USERS, wide_ts=True)
    pq.write_table(pa.Table.from_pandas(
        ev[["event_id", "ts", "user_id", "event_type", "value"]],
        preserve_index=False), out / "events.parquet")
    return str(out)


def _pdf(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    elif not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return res.sort_values(list(res.columns)).reset_index(drop=True)


def _ref_events(sf_dir: str) -> pd.DataFrame:
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    return df.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort", ignore_index=True)


def test_time_window_sum_planted(planted_dir):
    df = _ref_events(planted_dir)
    want = []
    for _, g in df.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        vm = np.floor(g["value"].to_numpy() * 1000.0).astype(np.int64)
        cum = np.r_[0, np.cumsum(vm)]
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - dq._TW_WINDOW_US, side="left")
        want.append(pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "w_sum_milli": cum[hi] - cum[lo]}))
    got = _pdf(dq.q_time_window_sum(planted_dir))
    pd.testing.assert_frame_equal(
        got, _pdf(pd.concat(want)), check_dtype=False)


def test_time_window_sum_overflow_fallback(wide_dir):
    """150-year spread: #segments * stride exceeds 2^62, so the
    per-segment loop tier runs — and must produce the same values the
    composite-key tier would."""
    df = _ref_events(wide_dir)
    ts_all = df["ts_us"].to_numpy()
    stride = int(ts_all.max() - ts_all.min()) + dq._TW_WINDOW_US + 2
    assert df["user_id"].nunique() * stride >= (1 << 62), \
        "planted data no longer trips the overflow fallback"
    want = []
    for _, g in df.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        vm = np.floor(g["value"].to_numpy() * 1000.0).astype(np.int64)
        cum = np.r_[0, np.cumsum(vm)]
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - dq._TW_WINDOW_US, side="left")
        want.append(pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "w_sum_milli": cum[hi] - cum[lo]}))
    got = _pdf(dq.q_time_window_sum(wide_dir))
    pd.testing.assert_frame_equal(
        got, _pdf(pd.concat(want)), check_dtype=False)


def test_event_debounce_planted(planted_dir):
    df = pq.read_table(f"{planted_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    kept = []
    for _, g in df.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"],
            kind="mergesort").groupby(["user_id", "event_type"]):
        last = None
        for _, r in g.iterrows():
            if last is None or r["ts_us"] - last > dq._DEBOUNCE_US:
                kept.append((r["event_id"], r["user_id"],
                             r["event_type"]))
                last = r["ts_us"]
    want = pd.DataFrame(kept, columns=["event_id", "user_id",
                                       "event_type"])
    got = _pdf(dq.q_event_debounce(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False)


def test_scd2_history_planted(planted_dir):
    df = _ref_events(planted_dir)
    out = []
    for _, g in df.groupby("user_id"):
        et = g["event_type"].to_numpy()
        keep = np.r_[True, et[1:] != et[:-1]]
        vf = g["ts_us"].to_numpy()[keep]
        vt = np.r_[vf[1:], -1]
        out.append(pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[keep],
            "event_id": g["event_id"].to_numpy()[keep],
            "event_type": et[keep],
            "valid_from_us": vf, "valid_to_us": vt}))
    got = _pdf(dq.q_scd2_history(planted_dir))
    pd.testing.assert_frame_equal(
        got, _pdf(pd.concat(out)), check_dtype=False)


def test_autocorr_planted(planted_dir):
    df = _ref_events(planted_dir)
    rows = []
    for u, g in df.groupby("user_id"):
        v = g["value"].to_numpy(np.float64)
        if len(v) < 3:
            continue
        x, y = v[:-1], v[1:]
        dx, dy = x - x.mean(), y - y.mean()
        denom = np.sqrt(float(dx @ dx) * float(dy @ dy))
        if denom <= 0:
            continue
        rows.append((u, len(x),
                     dq._round_half_away(float(dx @ dy) / denom)))
    want = pd.DataFrame(rows, columns=["user_id", "n_pairs",
                                       "autocorr"])
    got = _pdf(dq.q_autocorr_by_user(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False,
                                  rtol=0, atol=1e-9)


def test_user_paths_planted(planted_dir):
    df = _ref_events(planted_dir)
    want = df.groupby("user_id")["event_type"].agg(
        lambda s: ">".join(s.iloc[:dq._PATH_CAP])).reset_index() \
        .rename(columns={"event_type": "path"})
    got = _pdf(dq.q_user_paths(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False)


def test_conversion_latency_planted(planted_dir):
    df = _ref_events(planted_dir)
    deltas = []
    for _, g in df.groupby("user_id"):
        ts, et = g["ts_us"].to_numpy(), g["event_type"].to_numpy()
        views = ts[et == dq._CONV_FROM]
        if not len(views):
            continue
        t0 = views.min()
        clicks = ts[(et == dq._CONV_TO) & (ts > t0)]
        if len(clicks):
            deltas.append(int(clicks.min() - t0))
    deltas = np.sort(np.asarray(deltas, np.int64))
    want = pd.DataFrame({
        "q": list(dq.CONV_QS),
        "value": [float(deltas[int(np.floor((len(deltas) - 1) * q))])
                  for q in dq.CONV_QS]})
    got = _pdf(dq.q_conversion_latency(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False)


def test_reorder_gap_hist_planted(planted_dir):
    od = pq.read_table(f"{planted_dir}/orders.parquet").to_pandas()
    od["d_us"] = od["o_orderdate"].astype("datetime64[us]") \
        .astype("int64")
    buckets = []
    for _, g in od.sort_values(["o_custkey", "d_us", "o_orderkey"],
                               kind="mergesort").groupby("o_custkey"):
        ts = g["d_us"].to_numpy()
        if len(ts) < 2:
            continue
        gaps = np.floor((ts[1:] - ts[:-1]) / 86400000000.0) \
            .astype(np.int64)
        buckets.extend(gaps // dq._REORDER_BUCKET_DAYS)
    b, n = np.unique(np.asarray(buckets, np.int64), return_counts=True)
    want = pd.DataFrame({"bucket": b, "n": n})
    got = _pdf(dq.q_reorder_gap_hist(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False)


def test_events_ohlc_planted(planted_dir):
    df = pq.read_table(f"{planted_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    df["bucket"] = np.floor(df["ts_us"] / 3600000000.0) \
        .astype(np.int64)
    df = df.sort_values(["user_id", "bucket", "ts_us", "value"],
                        kind="mergesort")
    want = df.groupby(["user_id", "bucket"], as_index=False).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n=("value", "size"))
    want = want[["user_id", "bucket", "open", "high", "low", "close",
                 "n"]]
    got = _pdf(dq.q_events_ohlc(planted_dir))
    pd.testing.assert_frame_equal(got, _pdf(want), check_dtype=False)
