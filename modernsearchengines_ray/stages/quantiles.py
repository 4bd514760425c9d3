"""Distributed EXACT quantile selection (no full sort, no sketch).

``ds.sort(col)`` answers quantiles but pays an all-to-all shuffle of
every byte.  Exact selection needs only the RANKS, so the classic
histogram-refinement plan does it in streaming passes whose driver
state is a fixed-size count vector:

1. ``aggregate(Count, Min, Max)`` — one streaming pass.
2. A custom ``AggregateFn`` whose accumulator is a ``bins``-long
   count vector: each block histograms its values (one vectorized
   ``np.bincount``); merges add vectors.  The driver receives just
   the final vector (``bins × 8`` bytes), never row data.
3. For each requested quantile the cumulative histogram names the one
   bin holding the target rank.  One ``filter`` pass pulls ONLY rows
   in candidate bins (expected ``n/bins`` rows per bin, independent of
   n) and a local sort selects the exact order statistic.

Quantile definition (mirrors an order-statistics SQL oracle exactly,
no interpolation): ``q`` maps to the ``floor((n-1)·q) + 1``-th
smallest value — the "lower" method, always an element of the data.

Skew caveat: a value occurring with frequency ≫ n/bins concentrates
its bin and step 3's pull grows accordingly; ``max_candidate_rows``
guards the driver by raising instead of silently materializing (a
second refinement round inside the hot bin is the escape hatch — not
needed for any testdata distribution, documented rather than built).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bin_index(vals: np.ndarray, lo: float, width: float,
               bins: int) -> np.ndarray:
    """The ONE binning rule both passes share (fp-consistent)."""
    idx = np.floor((vals - lo) / width).astype(np.int64)
    return np.clip(idx, 0, bins - 1)


def _nan_excluded_stats(ds, col: str) -> tuple[int, float, float]:
    """(count, min, max) of ``ds[col]`` over NaN/null-EXCLUDED values,
    one custom streaming pass.  The stock ``Count()`` counts nulls (Ray
    2.49 ignore_nulls=False) and ``Min``/``Max`` return null on
    any-null columns, so both would desync the target ranks from the
    null-free histogram (ADVICE r3: median of 1..100 plus 50 nulls
    returned 75.0).  Arrow nulls surface as NaN through
    ``to_numpy(zero_copy_only=False)``, so one NaN filter covers both
    encodings, identically to the histogram passes."""
    from ray.data.aggregate import AggregateFn

    def acc_stats(state: np.ndarray, block) -> np.ndarray:
        vals = block.column(col).to_numpy(zero_copy_only=False)
        vals = vals[~np.isnan(vals)] if vals.dtype.kind == "f" else vals
        if len(vals):
            state = np.array([state[0] + len(vals),
                              min(state[1], float(vals.min())),
                              max(state[2], float(vals.max()))])
        return state

    stats_fn = AggregateFn(
        init=lambda k: np.array([0.0, np.inf, -np.inf]),
        merge=lambda a, b: np.array([a[0] + b[0], min(a[1], b[1]),
                                     max(a[2], b[2])]),
        accumulate_block=acc_stats,
        name="nan_stats")
    st = np.asarray(ds.aggregate(stats_fn)["nan_stats"], dtype=np.float64)
    return int(st[0]), float(st[1]), float(st[2])


def exact_quantiles(ds, col: str, qs: tuple[float, ...],
                    bins: int = 4096,
                    max_candidate_rows: int = 5_000_000,
                    interpolate: bool = False) -> pa.Table:
    """Exact order-statistic quantiles of ``ds[col]``.

    Returns a pyarrow Table ``(q float64, value float64)`` with one
    row per requested quantile, ordered as given.  Nulls in ``col``
    are excluded (SQL aggregate semantics).

    ``interpolate=True`` switches from the "lower" rule to SQL
    ``percentile_cont`` semantics: with ``h = (n-1)·q``,
    ``k = floor(h)`` and ``frac = h - k``, the result is
    ``v_k + frac·(v_{k+1} - v_k)`` over the 0-based sorted order
    statistics — still exact (both neighbouring order statistics are
    pulled through the same candidate-bin refinement; the plan cost
    is unchanged because rank k+1 is almost always in the same bin).
    The arithmetic is written in exactly that operation order so a
    SQL oracle spelling the same formula matches bit-for-bit before
    rounding.
    """
    from ray.data.aggregate import AggregateFn

    n, lo, hi = _nan_excluded_stats(ds, col)
    if n == 0:
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           pa.float64())})
    if hi <= lo:  # constant column: every quantile is that value
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([lo] * len(qs),
                                           pa.float64())})
    width = (hi - lo) / bins

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        vals = block.column(col).to_numpy(zero_copy_only=False)
        vals = vals[~np.isnan(vals)] if vals.dtype.kind == "f" else vals
        if len(vals):
            idx = _bin_index(vals.astype(np.float64), lo, width, bins)
            state = state + np.bincount(idx, minlength=bins)
        return state

    hist_fn = AggregateFn(
        init=lambda k: np.zeros(bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        name="bin_hist")
    hist = np.asarray(ds.aggregate(hist_fn)["bin_hist"], dtype=np.int64)
    cum = np.cumsum(hist)

    # target ranks (1-based) and the bin containing each; under
    # interpolation the upper neighbour rank k+2 (1-based) is needed
    # too whenever frac > 0
    ranks = [int(np.floor((n - 1) * q)) + 1 for q in qs]
    fracs = [(n - 1) * q - np.floor((n - 1) * q) for q in qs]
    hi_ranks = [min(r + 1, n) if (interpolate and f > 0) else r
                for r, f in zip(ranks, fracs)]
    need_bins = sorted({int(np.searchsorted(cum, r))
                        for r in list(ranks) + list(hi_ranks)})
    pull = int(hist[need_bins].sum())
    if pull > max_candidate_rows:
        raise ValueError(
            f"candidate bins hold {pull} rows > max_candidate_rows="
            f"{max_candidate_rows}; raise bins= or refine recursively")

    bins_arr = np.asarray(need_bins, dtype=np.int64)

    def in_candidate_bins(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        finite = (~np.isnan(vals) if vals.dtype.kind == "f"
                  else np.ones(len(vals), bool))
        idx = _bin_index(np.where(finite, vals, lo).astype(np.float64),
                         lo, width, bins)
        mask = finite & np.isin(idx, bins_arr)
        return pa.table({col: pa.array(vals[mask], pa.float64()),
                         "bin": pa.array(idx[mask], pa.int64())})

    # expected n/bins rows per needed bin — small under the guard;
    # columnar pull (to_pandas), not per-row dicts
    cand = ds.select_columns([col]) \
        .map_batches(in_candidate_bins, batch_format="pyarrow") \
        .to_pandas()
    cvals = cand[col].to_numpy(dtype=np.float64)
    cbins = cand["bin"].to_numpy(dtype=np.int64)

    def order_stat(r: int) -> float:
        b = int(np.searchsorted(cum, r))
        before = int(cum[b - 1]) if b > 0 else 0
        local = np.sort(cvals[cbins == b])
        return float(local[r - before - 1])

    out = []
    for q, r, r_hi, frac in zip(qs, ranks, hi_ranks, fracs):
        v_lo = order_stat(r)
        if interpolate and r_hi != r:
            v_hi = order_stat(r_hi)
            out.append(v_lo + float(frac) * (v_hi - v_lo))
        else:
            out.append(v_lo)
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out, pa.float64())})


def weighted_quantiles(ds, col: str, weight_col: str,
                       qs: tuple[float, ...], bins: int = 4096,
                       max_candidate_rows: int = 5_000_000,
                       weight_scale: float = 1.0) -> pa.Table:
    """Exact LOWER weighted quantiles: for each ``q`` the smallest
    value ``v`` with ``cumweight(<= v) >= q * W`` — the
    inventory/revenue-weighted median family (``weighted_median`` =
    ``qs=(0.5,)``).

    Same two-pass histogram-refinement plan as :func:`exact_quantiles`
    (no global sort; candidate bins only are pulled), with COUNTS
    replaced by WEIGHT MASS.  Determinism contract: weights accumulate
    as ``floor(weight * weight_scale)`` int64 — integer addition is
    associative, so cross-block merge order cannot move a threshold
    comparison the way float partial sums could.  Rows whose value OR
    weight is null/NaN, or whose scaled weight is <= 0, are excluded.
    Each ``q`` must satisfy ``0 < q <= 1`` (a ``q=0`` "smallest value
    with positive mass" is ``qs=(tiny,)`` by this rule, matching SQL's
    ``min(v) WHERE cum >= q*W`` mirror exactly).
    """
    from ray.data.aggregate import AggregateFn

    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"each q must be in (0, 1], got {qs!r}")

    def vw(block) -> tuple[np.ndarray, np.ndarray]:
        vals = block.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = block.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sw = np.floor(w * weight_scale)
        ok = ~np.isnan(vals) & ~np.isnan(sw) & (sw > 0)
        return vals[ok], sw[ok].astype(np.int64)

    # Total mass accumulates as a PYTHON INT (arbitrary precision) so it
    # stays exactly in sync with the int64 histogram ``cum`` — a float64
    # partial sum desyncs past ~2^53 total mass and can push a q≈1
    # target past cum[-1] (out-of-range searchsorted bin).
    def acc_stats(state: tuple, block) -> tuple:
        vals, w = vw(block)
        if len(vals):
            state = (state[0] + int(w.sum()),
                     min(state[1], float(vals.min())),
                     max(state[2], float(vals.max())))
        return state

    stats_fn = AggregateFn(
        init=lambda k: (0, np.inf, -np.inf),
        merge=lambda a, b: (a[0] + b[0], min(a[1], b[1]),
                            max(a[2], b[2])),
        accumulate_block=acc_stats,
        name="w_stats")
    st = ds.aggregate(stats_fn)["w_stats"]
    total_w, lo, hi = int(st[0]), float(st[1]), float(st[2])
    if total_w == 0:
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           pa.float64())})
    if hi <= lo:
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([lo] * len(qs),
                                           pa.float64())})
    width = (hi - lo) / bins

    def acc_hist(state: np.ndarray, block) -> np.ndarray:
        vals, w = vw(block)
        if len(vals):
            idx = _bin_index(vals, lo, width, bins)
            state = state + np.stack([
                np.bincount(idx, weights=w,
                            minlength=bins).astype(np.int64),
                np.bincount(idx, minlength=bins),
            ])
        return state

    hist_fn = AggregateFn(
        init=lambda k: np.zeros((2, bins), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_hist,
        name="w_hist")
    both = np.asarray(ds.aggregate(hist_fn)["w_hist"], dtype=np.int64)
    hist, rows = both[0], both[1]
    cum = np.cumsum(hist)

    # weight-mass target per q; searchsorted(left) = first bin whose
    # cumulative mass reaches it.  total_w is an exact int, but q*W is
    # computed in double — for W > 2^53 the rounded product can exceed
    # cum[-1] (== total_w exactly, same int64 sums), so clamp targets to
    # total mass and bins to the last bin.
    targets = [min(q * total_w, float(cum[-1])) for q in qs]
    need_bins = sorted({min(int(np.searchsorted(cum, t, side="left")),
                            bins - 1)
                        for t in targets})
    # the pull guard bounds candidate ROWS (what actually crosses to
    # the driver), not weight mass
    pull = int(rows[np.asarray(need_bins, dtype=np.int64)].sum())
    if pull > max_candidate_rows:
        raise ValueError(
            f"candidate bins hold {pull} rows > max_candidate_rows="
            f"{max_candidate_rows}; raise bins= or refine recursively")
    bins_arr = np.asarray(need_bins, dtype=np.int64)

    def in_candidate_bins(batch: pa.Table) -> pa.Table:
        vals, w = vw(batch)
        idx = _bin_index(vals, lo, width, bins)
        mask = np.isin(idx, bins_arr)
        return pa.table({
            "v": pa.array(vals[mask], pa.float64()),
            "w": pa.array(w[mask], pa.int64()),
            "bin": pa.array(idx[mask], pa.int64()),
        })

    cand = ds.select_columns([col, weight_col]) \
        .map_batches(in_candidate_bins, batch_format="pyarrow") \
        .to_pandas()
    cvals = cand["v"].to_numpy(dtype=np.float64)
    cw = cand["w"].to_numpy(dtype=np.int64)
    cbins = cand["bin"].to_numpy(dtype=np.int64)

    out = []
    for q, t in zip(qs, targets):
        b = min(int(np.searchsorted(cum, t, side="left")), bins - 1)
        before = int(cum[b - 1]) if b > 0 else 0
        sel = cbins == b
        order = np.argsort(cvals[sel], kind="stable")
        local_cum = before + np.cumsum(cw[sel][order])
        i = min(int(np.searchsorted(local_cum, t, side="left")),
                len(order) - 1)
        out.append(float(cvals[sel][order][i]))
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out, pa.float64())})


def exact_quantiles_by_group(ds, col: str, group_col: str,
                             qs: tuple[float, ...],
                             bins: int = 4096,
                             max_candidate_rows: int = 5_000_000
                             ) -> pa.Table:
    """Exact order-statistic quantiles of ``ds[col]`` PER GROUP.

    Same histogram-refinement plan as :func:`exact_quantiles`, grouped:
    one global Min/Max fixes a shared binning rule, one streaming map
    emits (group, bin, count) long-format partials (≤ groups×bins rows
    per block, usually far fewer), a ``groupby`` sums them, and ONE
    refinement pass pulls only rows in each group's candidate bins.
    Driver state = the groups×bins aggregate + the pulled candidates.
    Assumes a low-cardinality group column (aggregation keys, flags —
    NOT user ids); for high-cardinality keys use
    ``sort + map_groups`` instead, which shuffles everything once.

    Returns ``(group_col, q, value)``, groups sorted, qs in given
    order.  Null/NaN values of ``col`` are excluded (SQL aggregate
    semantics), in the shared-stats, histogram and refinement passes
    alike."""
    from ray.data.aggregate import Sum

    _, lo, hi = _nan_excluded_stats(ds, col)
    if hi <= lo:
        hi = lo + 1.0  # constant column: any single bin works
    width = (hi - lo) / bins

    def hist(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # NaN/null exclusion, same rule as exact_quantiles.acc_block —
        # np.floor(NaN).astype(int64) is UB and would corrupt bin 0
        finite = ~np.isnan(vals)
        vals = vals[finite]
        grps = batch.column(group_col).filter(pa.array(finite))
        idx = _bin_index(vals, lo, width, bins)
        df = pd.DataFrame({"g": grps.to_pandas(), "b": idx})
        agg = df.groupby(["g", "b"], as_index=False, sort=False).size()
        return pa.table({
            group_col: pa.Array.from_pandas(agg["g"]).cast(
                batch.schema.field(group_col).type),
            "bin": pa.array(agg["b"].to_numpy(), pa.int64()),
            "cnt": pa.array(agg["size"].to_numpy(), pa.int64()),
        })

    htab = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby([group_col, "bin"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).to_pandas()

    # per-group cumulative histograms and target bins
    need: dict = {}  # group -> set of needed bins
    plans: list = []  # (group, q, rank, bin, before)
    for g, sub in htab.groupby(group_col):
        sub = sub.sort_values("bin")
        gbins = sub["bin"].to_numpy()
        gcum = np.cumsum(sub["cnt"].to_numpy())
        n_g = int(gcum[-1])
        for q in qs:
            r = int(np.floor((n_g - 1) * q)) + 1
            j = int(np.searchsorted(gcum, r))
            b = int(gbins[j])
            before = int(gcum[j - 1]) if j > 0 else 0
            need.setdefault(g, set()).add(b)
            plans.append((g, q, r, b, before))
    pull = sum(int(htab[(htab[group_col] == g) & htab["bin"].isin(bs)]
                   ["cnt"].sum()) for g, bs in need.items())
    if pull > max_candidate_rows:
        raise ValueError(
            f"candidate bins hold {pull} rows > max_candidate_rows="
            f"{max_candidate_rows}; raise bins= or refine recursively")
    need_pairs = {(g, b) for g, bs in need.items() for b in bs}

    def in_need(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        finite = ~np.isnan(vals)
        vals = vals[finite]
        grps = batch.column(group_col).filter(pa.array(finite)) \
            .to_pylist()
        idx = _bin_index(vals, lo, width, bins)
        mask = np.fromiter(
            ((g, int(b)) in need_pairs for g, b in zip(grps, idx)),
            dtype=bool, count=len(grps))
        return pa.table({
            group_col: pa.array(
                [g for g, m in zip(grps, mask) if m],
                batch.schema.field(group_col).type),
            col: pa.array(vals[mask], pa.float64()),
            "bin": pa.array(idx[mask], pa.int64()),
        })

    cand = ds.select_columns([group_col, col]) \
        .map_batches(in_need, batch_format="pyarrow").to_pandas()

    out_g, out_q, out_v = [], [], []
    for g, q, r, b, before in sorted(
            plans, key=lambda p: (str(p[0]), p[1])):
        local = np.sort(cand.loc[
            (cand[group_col] == g) & (cand["bin"] == b), col
        ].to_numpy(dtype=np.float64))
        out_g.append(g)
        out_q.append(q)
        out_v.append(float(local[r - before - 1]))
    return pa.table({
        group_col: pa.Array.from_pandas(
            pd.Series(out_g, dtype=htab[group_col].dtype)),
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.float64()),
    })


# ---------------------------------------------------------------------------
# One-pass MERGEABLE approximate quantiles (the 100-TB streaming path)
# ---------------------------------------------------------------------------

_KMV_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd (golden-ratio) => bijective


def _kmv_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of a unique row id: multiply by an odd
    constant mod 2^64 (a bijection, so distinct ids never collide and
    the bottom-k set is a true uniform-without-replacement sample of
    the rows, identical on every cluster size and block order)."""
    with np.errstate(over="ignore"):
        return ids.astype(np.uint64) * _KMV_MULT


def _kmv_truncate(h: np.ndarray, v: np.ndarray, k: int):
    """Keep the k smallest (hash, value) pairs; the value tie-break
    keeps the selection total even under adversarial equal hashes."""
    if len(h) > k:
        order = np.lexsort((v, h))[:k]
        return h[order], v[order]
    return h, v


def approx_quantiles_kmv(ds, col: str, id_col: str,
                         qs: tuple[float, ...],
                         k: int = 4096) -> pa.Table:
    """ONE-pass mergeable approximate quantiles via bottom-k-by-hash
    sampling (the KMV / min-hash sample, Bar-Yossef et al. 2002).

    :func:`exact_quantiles` above is exact but needs a second
    candidate-pull pass plus a refinement guard; this is the
    streaming-scale complement: each block keeps its k smallest
    ``(hash(id), value)`` pairs (a few KB), partials merge by
    concat+truncate — ASSOCIATIVE and commutative, so Ray's aggregate
    tree can combine them in any order and the final sample is
    bit-identical on any partitioning.  The driver only ever holds
    k pairs.  The bottom-k-by-bijective-hash set is a simple random
    sample without replacement, so the sample quantile's rank error
    is O(sqrt(q(1-q)/k)) (~1.6% at k=4096, q=0.5) — gated as a
    derived invariant by ``quantile_sketch_check``, never
    hash-compared directly.

    Requires ``id_col`` unique (int64); nulls/NaN in ``col`` are
    excluded.  Returns ``(q float64, value float64)``, one row per
    requested quantile, using the same lower order-statistic rule as
    :func:`exact_quantiles` applied to the sample.

    The accumulator is ONE flat float64 vector ``[m, h_0..h_{k-1},
    v_0..v_{k-1}]`` (hashes bit-cast uint64<->float64, losslessly) so
    Ray's aggregate exchange ships a native Arrow tensor instead of
    falling back to pickled Python objects.
    """
    from ray.data.aggregate import AggregateFn

    def pack(h: np.ndarray, v: np.ndarray) -> np.ndarray:
        state = np.zeros(1 + 2 * k, dtype=np.float64)
        m = len(h)
        state[0] = m
        state[1:1 + m] = h.view(np.float64)
        state[1 + k:1 + k + m] = v
        return state

    def unpack(state: np.ndarray):
        m = int(state[0])
        return (state[1:1 + m].view(np.uint64).copy(),
                state[1 + k:1 + k + m].copy())

    def acc_block(state, block):
        sh, sv = unpack(state)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        vals = block.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        finite = ~np.isnan(vals)
        h = _kmv_hash(ids[finite])
        v = vals[finite]
        return pack(*_kmv_truncate(np.concatenate([sh, h]),
                                   np.concatenate([sv, v]), k))

    def merge(a, b):
        ah, av = unpack(a)
        bh, bv = unpack(b)
        return pack(*_kmv_truncate(np.concatenate([ah, bh]),
                                   np.concatenate([av, bv]), k))

    kmv_fn = AggregateFn(
        init=lambda _: np.zeros(1 + 2 * k, dtype=np.float64),
        merge=merge,
        accumulate_block=acc_block,
        name="kmv")
    final = np.asarray(
        ds.select_columns([id_col, col]).aggregate(kmv_fn)["kmv"])
    _, sample_v = unpack(final)
    m = len(sample_v)
    if m == 0:
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           pa.float64())})
    sv = np.sort(sample_v)
    out = [float(sv[int(np.floor((m - 1) * q))]) for q in qs]
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out, pa.float64())})
