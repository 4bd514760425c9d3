"""Distributed 2-D skyline (Pareto frontier) query.

``skyline_2d(ds, min_col, max_col)`` returns the distinct points not
dominated by any other point, where a point A dominates B when
``A.min_col <= B.min_col`` and ``A.max_col >= B.max_col`` with at
least one strict inequality (Börzsönyi, Kossmann & Stocker, ICDE
2001 — the SKYLINE OF operator).

Distribution shape — local prune, then a tiny global verify:

1. one ``map_batches`` pass computes each block's LOCAL skyline with a
   fully vectorized sort + running-max scan (sort by ``min_col`` asc,
   ``max_col`` desc; a point survives iff its ``max_col`` strictly
   exceeds the running max of everything sorted before it);
2. the global skyline is a subset of the union of local skylines (a
   global survivor's dominators in its own block would dominate it
   globally too), so the candidate set is at most
   ``blocks × per-block-frontier`` rows — for 2-D data that is
   O(blocks × log block_rows) in expectation, thousands of rows at
   any input scale, NOT O(input);
3. the same scan runs once over the pulled candidate set to produce
   the exact frontier.

No shuffle, one streaming pass over the input; the only materialized
rows are the candidates.  The per-block frontier bound is the
partitioning assumption: adversarial data where every point is on the
frontier (perfectly anti-correlated columns) degrades the candidate
pull to O(distinct points) — the classical skyline worst case, not a
flaw of the distribution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the skyline of distinct (x min, y max)
    points.  Callers pass deduplicated pairs."""
    order = np.lexsort((-y, x))  # x asc, y desc within ties
    ys = y[order]
    run_max = np.maximum.accumulate(ys)
    prev_max = np.concatenate(([-np.inf], run_max[:-1]))
    keep_sorted = ys > prev_max
    keep = np.zeros(len(x), dtype=bool)
    keep[order] = keep_sorted
    return keep


def _dedup_pairs(x: np.ndarray, y: np.ndarray):
    pts = np.stack([x, y], axis=1)
    uniq = np.unique(pts, axis=0)
    return uniq[:, 0], uniq[:, 1]


def skyline_2d(ds, min_col: str, max_col: str):
    """Pareto frontier of ``ds`` minimizing ``min_col`` and maximizing
    ``max_col``; returns a pyarrow Table ``(min_col, max_col)`` of the
    distinct frontier points (small by construction — see module
    docstring)."""

    def block_skyline(batch: pa.Table) -> pa.Table:
        x = batch[min_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = batch[max_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = np.isfinite(x) & np.isfinite(y)
        x, y = _dedup_pairs(x[ok], y[ok])
        keep = _local_skyline(x, y)
        return pa.table({min_col: pa.array(x[keep], pa.float64()),
                         max_col: pa.array(y[keep], pa.float64())})

    cand = ds.select_columns([min_col, max_col]) \
        .map_batches(block_skyline, batch_format="pyarrow").to_pandas()
    x, y = _dedup_pairs(cand[min_col].to_numpy(),
                        cand[max_col].to_numpy())
    keep = _local_skyline(x, y)
    return pa.table({min_col: pa.array(x[keep], pa.float64()),
                     max_col: pa.array(y[keep], pa.float64())})
