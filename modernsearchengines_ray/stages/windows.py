"""Distributed per-key ordered window functions: ``row_number``,
running sum, and ``lag`` — the analytics family SQL spells
``... OVER (PARTITION BY key ORDER BY ts, id)``.

The reference engine has none of these (its only per-group work is
the postings accumulation, A1); this is part of the training-data /
event-analytics extension family, built on the same plan as the as-of
join (stages/joins.py):

1. ONE distributed range sort by ``(key, ts_us, id)`` — the only
   exchange a SQL engine would need for the same window anyway;
2. per sorted block, a vectorized segmented pass computes the
   BLOCK-LOCAL window values (local row number, local running sum,
   in-block lag) and emits one summary row per (block, key): the
   segment's row count, sum, and last value — the only state any
   later block can need;
3. an associative stitch adds each row's offset from the running
   per-key prefix over earlier blocks' summaries.  Range sort means
   blocks hold disjoint ``(key, ts_us, id)`` ranges, so "earlier
   summaries" is exactly "earlier rows" — the prefix is well-defined.

``reduce="driver"`` stitches in one driver pass (test scale — the
stitch input is O(input rows), same contract as the as-of driver
tier); ``reduce="partitioned"`` hash-repartitions partials by key and
stitches per block with zero driver state.  Both tiers are
bit-identical.  A key hotter than one partition degrades to one block
holding that key — the same behavior as PARTITION BY in any
shuffle-based SQL engine; document, don't hide.

Determinism / conformance notes:

- ``(key, ts, id)`` must be unique (true for event logs keyed by a
  unique event id).  The sort order — and therefore every output —
  is then total and engine-independent.
- The running sum is computed over ``floor(value * scale)`` as int64,
  NOT over the raw double: integer addition is associative, so the
  block-partial + offset plan is EXACT and hash-identical to a
  sequential SQL accumulate, where a float cumsum would diverge in
  the last bits depending on block boundaries.  ``floor`` (not cast,
  not round) because numpy and DuckDB agree on floor semantics for
  every finite double.
- ``lag`` moves a value without arithmetic, so it stays a raw double;
  rows with no predecessor carry ``has_prev=false`` with a 0.0
  sentinel (no nulls in output — the driver's value-hash must not
  depend on engine null encodings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PARTIAL_SCHEMA = pa.schema([
    ("key", pa.int64()),
    ("ts_us", pa.int64()),
    ("id", pa.int64()),
    ("side", pa.int8()),          # 0 = row, 1 = per-(block,key) summary
    ("local_rn", pa.int64()),     # rows: in-block row number (1-based)
    ("local_sum", pa.int64()),    # rows: in-block running sum (scaled)
    ("prev_value", pa.float64()),  # rows: in-block lag value
    ("has_prev", pa.bool_()),     # rows: in-block lag resolved
    ("seg_count", pa.int64()),    # summaries: rows in this (block,key)
    ("seg_sum", pa.int64()),      # summaries: scaled sum of the segment
    ("last_value", pa.float64()),  # summaries: raw value of the last row
])

_OUT_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("key", pa.int64()),
    ("ts_us", pa.int64()),
    ("rn", pa.int64()),
    ("run_sum_scaled", pa.int64()),
    ("prev_value", pa.float64()),
    ("has_prev", pa.bool_()),
])


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new key segment begins (input is
    key-sorted)."""
    new = np.empty(len(keys), dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    return new


def _window_partials(batch: pa.Table, scale: float) -> pa.Table:
    """Per sorted block: segmented local window values + one summary
    row per (block, key).  Fully vectorized."""
    n = batch.num_rows
    if n == 0:
        return _PARTIAL_SCHEMA.empty_table()
    keys = batch["key"].to_numpy(zero_copy_only=False)
    ts = batch["ts_us"].to_numpy(zero_copy_only=False)
    ids = batch["id"].to_numpy(zero_copy_only=False)
    raw = batch["value"].to_numpy(zero_copy_only=False)
    v = np.floor(raw * scale).astype(np.int64)

    idx = np.arange(n)
    new = _segment_starts(keys)
    # index of each row's segment start, propagated forward
    seg_start = np.maximum.accumulate(np.where(new, idx, -1))
    local_rn = idx - seg_start + 1
    cs = np.cumsum(v)
    local_sum = cs - cs[seg_start] + v[seg_start]
    prev = np.empty(n, dtype=np.float64)
    prev[0] = 0.0
    prev[1:] = raw[:-1]
    has_prev = ~new
    prev = np.where(has_prev, prev, 0.0)

    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    is_last[:-1] = keys[1:] != keys[:-1]
    s = idx[is_last]

    zeros_i = np.zeros(n, dtype=np.int64)
    zeros_f = np.zeros(len(s), dtype=np.float64)
    rows = pa.table({
        "key": pa.array(keys, pa.int64()),
        "ts_us": pa.array(ts, pa.int64()),
        "id": pa.array(ids, pa.int64()),
        "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        "local_rn": pa.array(local_rn, pa.int64()),
        "local_sum": pa.array(local_sum, pa.int64()),
        "prev_value": pa.array(prev, pa.float64()),
        "has_prev": pa.array(has_prev, pa.bool_()),
        "seg_count": pa.array(zeros_i, pa.int64()),
        "seg_sum": pa.array(zeros_i, pa.int64()),
        "last_value": pa.array(np.zeros(n), pa.float64()),
    })
    summaries = pa.table({
        "key": pa.array(keys[s], pa.int64()),
        "ts_us": pa.array(ts[s], pa.int64()),
        "id": pa.array(ids[s], pa.int64()),
        "side": pa.array(np.ones(len(s), dtype=np.int8), pa.int8()),
        "local_rn": pa.array(np.zeros(len(s), dtype=np.int64), pa.int64()),
        "local_sum": pa.array(np.zeros(len(s), dtype=np.int64), pa.int64()),
        "prev_value": pa.array(zeros_f, pa.float64()),
        "has_prev": pa.array(np.zeros(len(s), dtype=bool), pa.bool_()),
        "seg_count": pa.array(local_rn[s], pa.int64()),
        "seg_sum": pa.array(local_sum[s], pa.int64()),
        "last_value": pa.array(raw[s], pa.float64()),
    })
    return pa.concat_tables([rows, summaries])


def _stitch_windows(keys, ts, ids, side, local_rn, local_sum,
                    prev_value, has_prev, seg_count, seg_sum,
                    last_value) -> pa.Table:
    """Associative stitch over partials sorted by (key, ts_us, id,
    side): add each row's per-key prefix over earlier summaries.

    A block's summary carries the (ts, id) of its LAST row and
    side=1 > 0, so in sort order it lands immediately after its own
    rows and before every row of any later block — the
    maximum.accumulate trick then yields, for each row, the prefix
    over exactly the earlier blocks of its key."""
    n = len(keys)
    if n == 0:
        return _OUT_SCHEMA.empty_table()
    idx = np.arange(n)
    sum_mask = side == 1

    # per-key running prefix over the summaries, in sort order
    cum_count = np.zeros(n, dtype=np.int64)
    cum_sum = np.zeros(n, dtype=np.int64)
    s_pos = idx[sum_mask]
    if len(s_pos):
        s_keys = keys[s_pos]
        s_new = _segment_starts(s_keys)
        s_start = np.maximum.accumulate(
            np.where(s_new, np.arange(len(s_pos)), -1))
        cc = np.cumsum(seg_count[s_pos])
        ss = np.cumsum(seg_sum[s_pos])
        cum_count[s_pos] = cc - cc[s_start] + seg_count[s_pos][s_start]
        cum_sum[s_pos] = ss - ss[s_start] + seg_sum[s_pos][s_start]

    s_idx = np.where(sum_mask, idx, -1)
    last = np.maximum.accumulate(s_idx)
    safe = np.maximum(last, 0)
    valid = (last >= 0) & (keys[safe] == keys)

    off_count = np.where(valid, cum_count[safe], 0)
    off_sum = np.where(valid, cum_sum[safe], 0)
    fill_prev = valid & ~has_prev
    out_prev = np.where(fill_prev, last_value[safe], prev_value)
    out_has = has_prev | fill_prev

    r = idx[~sum_mask]
    return pa.table({
        "id": pa.array(ids[r], pa.int64()),
        "key": pa.array(keys[r], pa.int64()),
        "ts_us": pa.array(ts[r], pa.int64()),
        "rn": pa.array((off_count + local_rn)[r], pa.int64()),
        "run_sum_scaled": pa.array((off_sum + local_sum)[r], pa.int64()),
        "prev_value": pa.array(out_prev[r], pa.float64()),
        "has_prev": pa.array(out_has[r], pa.bool_()),
    })


def _stitch_block(batch: pa.Table) -> pa.Table:
    cols = {name: batch[name].to_numpy(zero_copy_only=False)
            for name in batch.schema.names}
    order = np.lexsort((cols["side"], cols["id"], cols["ts_us"],
                        cols["key"]))
    return _stitch_windows(
        cols["key"][order], cols["ts_us"][order], cols["id"][order],
        cols["side"][order], cols["local_rn"][order],
        cols["local_sum"][order], cols["prev_value"][order],
        cols["has_prev"][order], cols["seg_count"][order],
        cols["seg_sum"][order], cols["last_value"][order])


def keyed_blocks(ds, keys: list[str], num_partitions: int | None = None):
    """ONE hash exchange co-locating every row of a key into exactly
    one block — the PARTITION BY state every per-entity kernel needs,
    with NONE of ``groupby().map_groups``'s per-group costs (a Python
    dispatch + a pandas DataFrame construction per entity: at 10^8
    entities that is #groups × interpreter overhead — the round-2
    lesson this module encodes).  Downstream block kernels lexsort the
    block and run ONE vectorized segmented pass over all of its keys
    (see ``_window_partials`` for the canonical segment idioms).  A
    key hotter than one block's memory degrades exactly like SQL's
    PARTITION BY under any hash-shuffle engine — document, don't
    hide."""
    from ray.data.context import ShuffleStrategy

    from .dedup import default_join_partitions

    # flip the CHAIN's captured context (see joins.py: descendants
    # inherit the root dataset's DataContext snapshot)
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds.repartition(num_partitions or default_join_partitions(),
                          keys=keys, sort=False)


def window_functions(ds, key_col: str, ts_col: str, id_col: str,
                     value_col: str, scale: float = 1000.0,
                     reduce: str = "driver",
                     num_partitions: int | None = None):
    """Per-key ordered window functions over a Dataset; see module
    docstring for the plan and determinism contract.  Returns columns
    ``(id, key, ts_us, rn, run_sum_scaled, prev_value, has_prev)``
    where ``rn`` is the 1-based row number within key ordered by
    ``(ts, id)``, ``run_sum_scaled`` the inclusive running sum of
    ``floor(value * scale)``, and ``prev_value`` the lag-1 value.
    Driver tier returns a pyarrow Table; partitioned tier a Dataset."""

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch[key_col].cast(pa.int64()),
            "ts_us": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "id": batch[id_col].cast(pa.int64()),
            "value": batch[value_col].cast(pa.float64()),
        })

    parts_ds = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["key", "ts_us", "id"]) \
        .map_batches(lambda b: _window_partials(b, scale),
                     batch_size=None, batch_format="pyarrow")

    if reduce == "partitioned":
        from ray.data.context import ShuffleStrategy

        from .dedup import default_join_partitions

        # flip the CHAIN's captured context (see joins.py: descendants
        # inherit the root dataset's DataContext snapshot)
        parts_ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        shuffled = parts_ds.repartition(
            num_partitions or default_join_partitions(),
            keys=["key"], sort=False)
        return shuffled.map_batches(_stitch_block, batch_size=None,
                                    batch_format="pyarrow")
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    parts = parts_ds.to_pandas()
    if parts.empty or "key" not in parts.columns:
        return _OUT_SCHEMA.empty_table()
    parts = parts.sort_values(["key", "ts_us", "id", "side"],
                              kind="mergesort", ignore_index=True)
    return _stitch_windows(
        parts["key"].to_numpy(), parts["ts_us"].to_numpy(),
        parts["id"].to_numpy(), parts["side"].to_numpy(),
        parts["local_rn"].to_numpy(), parts["local_sum"].to_numpy(),
        parts["prev_value"].to_numpy(), parts["has_prev"].to_numpy(),
        parts["seg_count"].to_numpy(), parts["seg_sum"].to_numpy(),
        parts["last_value"].to_numpy())


# ---------------------------------------------------------------------------
# Moving-window aggregate: ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW
# ---------------------------------------------------------------------------

_MW_OUT_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("key", pa.int64()),
    ("ts_us", pa.int64()),
    ("rn", pa.int64()),
    ("win_sum_scaled", pa.int64()),
    ("win_n", pa.int64()),
])


def _mw_partial_schema(w: int) -> pa.Schema:
    return pa.schema(
        [("key", pa.int64()), ("ts_us", pa.int64()), ("id", pa.int64()),
         ("side", pa.int8()), ("local_rn", pa.int64()),
         ("local_win", pa.int64()), ("seg_count", pa.int64()),
         ("tail_n", pa.int64())]
        + [(f"tail_{k}", pa.int64()) for k in range(w - 1)])


def _mw_partials(batch: pa.Table, scale: float, w: int) -> pa.Table:
    """Per sorted block: segmented in-block window sums + one summary
    row per (block, key) carrying the segment's last min(w-1, len)
    scaled values (tail_0 = most recent) — the only history any later
    block can need, since a window spans at most w rows."""
    n = batch.num_rows
    if n == 0:
        return _mw_partial_schema(w).empty_table()
    keys = batch["key"].to_numpy(zero_copy_only=False)
    ts = batch["ts_us"].to_numpy(zero_copy_only=False)
    ids = batch["id"].to_numpy(zero_copy_only=False)
    v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                 * scale).astype(np.int64)

    idx = np.arange(n)
    new = _segment_starts(keys)
    seg_start = np.maximum.accumulate(np.where(new, idx, -1))
    pos = idx - seg_start           # 0-based position in segment
    cs = np.cumsum(v)
    seg_cs0 = cs[seg_start] - v[seg_start]   # cumsum just before seg
    # in-block window: last min(pos+1, w) values of the segment —
    # full windows subtract cs one-left of the window, open windows
    # (pos < w) cover the whole segment so far
    back = idx - w                   # index of cs one-left of window
    base = np.where(pos >= w, cs[np.maximum(back, 0)], seg_cs0)
    local_win = cs - base

    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    is_last[:-1] = keys[1:] != keys[:-1]
    s = idx[is_last]
    seg_len = pos[s] + 1
    tail_n = np.minimum(seg_len, w - 1)

    zeros_i = np.zeros(n, dtype=np.int64)
    row_cols = {
        "key": keys, "ts_us": ts, "id": ids,
        "side": np.zeros(n, dtype=np.int8),
        "local_rn": pos + 1, "local_win": local_win,
        "seg_count": zeros_i, "tail_n": zeros_i,
    }
    for k in range(w - 1):
        row_cols[f"tail_{k}"] = zeros_i
    sum_cols = {
        "key": keys[s], "ts_us": ts[s], "id": ids[s],
        "side": np.ones(len(s), dtype=np.int8),
        "local_rn": np.zeros(len(s), dtype=np.int64),
        "local_win": np.zeros(len(s), dtype=np.int64),
        "seg_count": seg_len.astype(np.int64),
        "tail_n": tail_n.astype(np.int64),
    }
    for k in range(w - 1):
        # value at distance k from the segment end, 0 where absent
        src = s - k
        valid = k < seg_len
        sum_cols[f"tail_{k}"] = np.where(valid, v[np.maximum(src, 0)], 0)

    schema = _mw_partial_schema(w)
    rows = pa.table({f.name: pa.array(row_cols[f.name], f.type)
                     for f in schema})
    sums = pa.table({f.name: pa.array(sum_cols[f.name], f.type)
                     for f in schema})
    return pa.concat_tables([rows, sums])


def _mw_stitch(cols: dict, w: int) -> pa.Table:
    """Stitch sorted partials: fold per-key prefix tails across
    summaries, then open rows (local_rn < w) borrow the missing
    window values from their preceding summary's prefix tail.

    The prefix tail at a summary needs at most the last w-1 values of
    the key's prefix; a summary whose own segment has >= w-1 rows is
    self-contained (the vectorized common path).  Shorter segments
    chain into earlier summaries — each contributes >= 1 value, so
    the chain is at most w-1 long; those rare rows fold in a python
    loop (O(#short-segment summaries), not O(rows))."""
    keys = cols["key"]
    n = len(keys)
    if n == 0:
        return _MW_OUT_SCHEMA.empty_table()
    idx = np.arange(n)
    side = cols["side"]
    sum_mask = side == 1
    s_pos = idx[sum_mask]

    # per-key prefix over summary seg_counts (for global rn)
    cum_count = np.zeros(n, dtype=np.int64)
    if len(s_pos):
        s_keys = keys[s_pos]
        s_new = _segment_starts(s_keys)
        s_start = np.maximum.accumulate(
            np.where(s_new, np.arange(len(s_pos)), -1))
        cc = np.cumsum(cols["seg_count"][s_pos])
        cum_count[s_pos] = cc - cc[s_start] \
            + cols["seg_count"][s_pos][s_start]

        # prefix tails at summaries: (n_summaries, w-1), col k = value
        # at distance k from the prefix end
        own = np.stack([cols[f"tail_{k}"][s_pos]
                        for k in range(w - 1)], axis=1)
        own_n = cols["tail_n"][s_pos]
        pref = own.copy()
        pref_n = own_n.copy()
        # chain the short segments (rare path); s_new marks key starts
        for j in np.nonzero(own_n < w - 1)[0]:
            if s_new[j]:
                continue  # first summary of its key: prefix = own
            take = int(own_n[j])
            room = w - 1 - take
            # shift own values up, fill the rest from the previous
            # summary's (already folded) prefix tail
            pref[j, take:take + room] = pref[j - 1, :room]
            pref_n[j] = min(take + int(pref_n[j - 1]), w - 1)
        # suffix sums over slots: borrow_sum(k) = sum of tail_0..k-1
        pref_sfx = np.concatenate(
            [np.zeros((len(s_pos), 1), dtype=np.int64),
             np.cumsum(pref, axis=1)], axis=1)
    else:
        pref_sfx = np.zeros((0, w), dtype=np.int64)
        pref_n = np.zeros(0, dtype=np.int64)

    # map each partial row to its preceding summary
    s_idx = np.where(sum_mask, idx, -1)
    last = np.maximum.accumulate(s_idx)
    safe = np.maximum(last, 0)
    valid = (last >= 0) & (keys[safe] == keys)

    # summary ordinal (position within s_pos) for gather
    ord_of = np.zeros(n, dtype=np.int64)
    ord_of[s_pos] = np.arange(len(s_pos))
    prev_ord = ord_of[safe]

    off_count = np.where(valid, cum_count[safe], 0)
    rn = off_count + cols["local_rn"]
    win_n = np.minimum(rn, w)
    need = np.maximum(win_n - cols["local_rn"], 0)
    need = np.where(valid, need, 0)
    borrow = np.zeros(n, dtype=np.int64)
    if len(s_pos):
        borrow = pref_sfx[prev_ord, np.minimum(need, w - 1)]
        borrow = np.where(need > 0, borrow, 0)
    win_sum = cols["local_win"] + borrow

    r = idx[~sum_mask]
    return pa.table({
        "id": pa.array(cols["id"][r], pa.int64()),
        "key": pa.array(keys[r], pa.int64()),
        "ts_us": pa.array(cols["ts_us"][r], pa.int64()),
        "rn": pa.array(rn[r], pa.int64()),
        "win_sum_scaled": pa.array(win_sum[r], pa.int64()),
        "win_n": pa.array(win_n[r], pa.int64()),
    })


def _mw_sorted_cols(batch_or_df, names) -> dict:
    if isinstance(batch_or_df, pa.Table):
        cols = {c: batch_or_df[c].to_numpy(zero_copy_only=False)
                for c in names}
    else:
        cols = {c: batch_or_df[c].to_numpy() for c in names}
    order = np.lexsort((cols["side"], cols["id"], cols["ts_us"],
                        cols["key"]))
    return {c: a[order] for c, a in cols.items()}


def moving_window_sum(ds, key_col: str, ts_col: str, id_col: str,
                      value_col: str, w: int = 3,
                      scale: float = 1000.0, reduce: str = "driver",
                      num_partitions: int | None = None):
    """Moving-window sum per key ordered by (ts, id) — SQL's
    ``sum(...) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN
    w-1 PRECEDING AND CURRENT ROW)`` — over ``floor(value*scale)``
    int64 (exact-associative, hash-identical to a sequential SQL
    accumulate; see :func:`window_functions`).  Returns
    ``(id, key, ts_us, rn, win_sum_scaled, win_n)`` where win_n =
    min(rn, w) is the number of rows the window actually covered.
    Same uniqueness contract and tier semantics as
    :func:`window_functions`."""
    if w < 2:
        raise ValueError("w must be >= 2 (w=1 is the identity)")

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch[key_col].cast(pa.int64()),
            "ts_us": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "id": batch[id_col].cast(pa.int64()),
            "value": batch[value_col].cast(pa.float64()),
        })

    parts_ds = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["key", "ts_us", "id"]) \
        .map_batches(lambda b: _mw_partials(b, scale, w),
                     batch_size=None, batch_format="pyarrow")
    names = [f.name for f in _mw_partial_schema(w)]

    if reduce == "partitioned":
        from ray.data.context import ShuffleStrategy

        from .dedup import default_join_partitions

        parts_ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        shuffled = parts_ds.repartition(
            num_partitions or default_join_partitions(),
            keys=["key"], sort=False)
        return shuffled.map_batches(
            lambda b: _mw_stitch(_mw_sorted_cols(b, names), w),
            batch_size=None, batch_format="pyarrow")
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    parts = parts_ds.to_pandas()
    if parts.empty or "key" not in parts.columns:
        return _MW_OUT_SCHEMA.empty_table()
    return _mw_stitch(_mw_sorted_cols(parts, names), w)
