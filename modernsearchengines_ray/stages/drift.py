"""Distribution-drift statistics — exact two-sample Kolmogorov–Smirnov
without a full sort.

The KS statistic ``D = max_x |F1(x) − F2(x)|`` is attained at a data
point, so like the exact-quantile plan (stages/quantiles.py) it needs
RANK information, not order: one streaming pass builds a per-(group,
bin) histogram under the shared binning rule, the driver computes the
ECDF difference at every bin boundary (all achieved at real data
points), and only bins whose interior COULD beat the running best —
bounded by ``d_prev + h1/n1`` from above and ``d_prev − h2/n2`` from
below, since each group's ECDF moves at most its bin mass inside the
bin — are pulled for an exact local sweep.  Driver state is two
``bins``-long count vectors plus the pulled candidates (expected
n/bins rows per candidate bin).

Every float that reaches the comparison is produced by the same
operation order a SQL oracle uses (``c1/n1 − c2/n2`` with int64
cumulative counts cast to double), so the statistic is bit-identical
to a window-function ECDF query before rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .quantiles import _bin_index, _nan_excluded_stats


def ks_statistic(ds, col: str, group_col: str, g1, g2,
                 bins: int = 4096,
                 max_candidate_rows: int = 5_000_000) -> pa.Table:
    """Exact two-sample KS statistic between ``col`` values of rows
    where ``group_col == g1`` vs ``== g2``.

    Returns a one-row pyarrow Table ``(ks float64, n1 int64,
    n2 int64)`` with the UNROUNDED statistic (callers round for
    gate parity).  Rows in neither group, and null/NaN values, are
    excluded.  Raises ``ValueError`` if either group is empty or the
    candidate pull exceeds ``max_candidate_rows``.
    """
    from ray.data.aggregate import AggregateFn

    def keep_groups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.or_(pc.equal(batch[group_col], g1),
                      pc.equal(batch[group_col], g2))
        return batch.filter(mask).select([group_col, col])

    filtered = ds.map_batches(keep_groups, batch_format="pyarrow")
    n_all, lo, hi = _nan_excluded_stats(filtered, col)
    if n_all == 0:
        raise ValueError("both groups empty")
    if hi <= lo:
        hi = lo + 1.0  # constant column: one bin, D decided by counts
    width = (hi - lo) / bins

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        vals = block.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        finite = ~np.isnan(vals)
        grp1 = np.asarray(
            pa.compute.equal(block.column(group_col), g1)
            .to_numpy(zero_copy_only=False), dtype=bool)
        idx = _bin_index(np.where(finite, vals, lo), lo, width, bins)
        state = state.copy()
        state[:bins] += np.bincount(idx[finite & grp1], minlength=bins)
        state[bins:] += np.bincount(idx[finite & ~grp1],
                                    minlength=bins)
        return state

    hist_fn = AggregateFn(
        init=lambda k: np.zeros(2 * bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        name="ks_hist")
    hist = np.asarray(filtered.aggregate(hist_fn)["ks_hist"],
                      dtype=np.int64)
    h1, h2 = hist[:bins], hist[bins:]
    n1, n2 = int(h1.sum()), int(h2.sum())
    if n1 == 0 or n2 == 0:
        raise ValueError(f"empty group: n1={n1} n2={n2}")

    cum1, cum2 = np.cumsum(h1), np.cumsum(h2)
    # diff at each bin's END — achieved at the largest data point in
    # the bin whenever the bin is nonempty; SQL op order: c/n as
    # float64 division of exact ints
    d_end = cum1.astype(np.float64) / n1 - cum2.astype(np.float64) / n2
    nonempty = (h1 + h2) > 0
    best = float(np.max(np.abs(d_end[nonempty])))

    # interior bound per bin: entering diff can rise by at most h1/n1
    # (only group-1 mass first) or fall by at most h2/n2
    d_prev = np.concatenate([[0.0], d_end[:-1]])
    bound = np.maximum(np.abs(d_prev + h1 / n1),
                       np.abs(d_prev - h2 / n2))
    # conservative slack: pulling an extra bin only costs work, while
    # skipping one whose float-computed interior sweep lands an ulp
    # above the float-computed bound would silently miss the max
    cand = np.flatnonzero(nonempty & (bound > best - 1e-9))
    if len(cand):
        pull = int((h1[cand] + h2[cand]).sum())
        if pull > max_candidate_rows:
            raise ValueError(
                f"candidate bins hold {pull} rows > max_candidate_rows"
                f"={max_candidate_rows}; raise bins=")
        cand_set = cand

        def in_cand(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            finite = ~np.isnan(vals)
            idx = _bin_index(np.where(finite, vals, lo), lo, width,
                             bins)
            mask = finite & np.isin(idx, cand_set)
            grp1 = np.asarray(
                pa.compute.equal(batch.column(group_col), g1)
                .to_numpy(zero_copy_only=False), dtype=bool)
            return pa.table({
                "v": pa.array(vals[mask], pa.float64()),
                "b": pa.array(idx[mask], pa.int64()),
                "g1": pa.array(grp1[mask], pa.bool_()),
            })

        rows = filtered.map_batches(in_cand, batch_format="pyarrow") \
            .to_pandas()
        for b in cand_set:
            sub = rows[rows["b"] == b]
            if not len(sub):
                continue
            piv = pd.DataFrame({
                "v": sub["v"].to_numpy(),
                "c1": sub["g1"].to_numpy().astype(np.int64),
                "c2": (~sub["g1"].to_numpy()).astype(np.int64),
            }).groupby("v", sort=True).sum()
            c1 = (int(cum1[b - 1]) if b > 0 else 0) \
                + np.cumsum(piv["c1"].to_numpy())
            c2 = (int(cum2[b - 1]) if b > 0 else 0) \
                + np.cumsum(piv["c2"].to_numpy())
            d = np.abs(c1.astype(np.float64) / n1
                       - c2.astype(np.float64) / n2)
            local = float(d.max())
            if local > best:
                best = local

    return pa.table({"ks": pa.array([best], pa.float64()),
                     "n1": pa.array([n1], pa.int64()),
                     "n2": pa.array([n2], pa.int64())})
