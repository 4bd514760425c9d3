"""Column profiling: per-column summary statistics in one streaming
pass (the DESCRIBE / data-quality primitive every curation pipeline
runs before and after each transform).

Plan: one ``map_batches`` pass emits LONG-FORMAT partials — one row
per (block, column) carrying (n, nulls, min, max) — and a tiny
``groupby(column)`` stitches them (rows crossing the exchange =
blocks × columns, independent of table size).  Distinct counts are a
separate narrow pass per column:

- ``distinct="exact"`` — ``Dataset.unique`` per column (a shuffle per
  column; the conformance tier, exact for the SQL gate);
- ``distinct="hll"`` — HyperLogLog partials folded in the SAME single
  pass as the other stats, shuffle-free (the 10^12-row tier; ±2%
  at the default precision, see functions/hll.py);
- ``distinct="none"`` — skip (n_distinct = -1).

min/max carry through untouched (no arithmetic), so the SQL oracle
matches them exactly even for floats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PROFILE_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("n_rows", pa.int64()),
    ("n_nulls", pa.int64()),
    ("min_val", pa.float64()),
    ("max_val", pa.float64()),
    ("n_distinct", pa.int64()),
])


def profile_columns(ds, columns: list[str], distinct: str = "exact",
                    hll_p: int = 12):
    """Profile numeric ``columns`` of ``ds``; returns a pyarrow Table
    with PROFILE_SCHEMA, one row per column (column order preserved).
    Empty input yields n_rows=0 rows with NaN min/max."""
    import ray

    from ..functions.hll import HyperLogLog

    if distinct not in ("exact", "hll", "none"):
        raise ValueError(f"unknown distinct mode: {distinct!r}")

    use_hll = distinct == "hll"

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [],
                "mn": [], "mx": []}
        regs = {"column": [], "reg": []}
        for col in columns:
            c = batch[col]
            n = len(c)
            nulls = c.null_count
            vals = c.drop_null()
            mn = pc.min(vals).as_py() if len(vals) else None
            mx = pc.max(vals).as_py() if len(vals) else None
            rows["column"].append(col)
            rows["n"].append(n)
            rows["nulls"].append(nulls)
            rows["mn"].append(float(mn) if mn is not None else np.nan)
            rows["mx"].append(float(mx) if mx is not None else np.nan)
            if use_hll:
                h = HyperLogLog(hll_p)
                h.add_many(vals.to_pylist())
                regs["column"].append(col)
                regs["reg"].append(h.registers.tobytes())
        out = pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "mn": pa.array(rows["mn"], pa.float64()),
            "mx": pa.array(rows["mx"], pa.float64()),
        })
        if use_hll:
            out = out.append_column(
                "reg", pa.array(regs["reg"], pa.binary()))
        return out

    parts = ray.get(ds.select_columns(columns)
                    .map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    parts = [t for t in parts if t.num_columns]
    if not parts:
        agg = {c: (0, 0, np.nan, np.nan) for c in columns}
        hlls = {}
    else:
        merged = pa.concat_tables(parts)
        agg = {}
        hlls = {}
        cols = merged["column"].to_pylist()
        ns = merged["n"].to_numpy(zero_copy_only=False)
        nulls = merged["nulls"].to_numpy(zero_copy_only=False)
        mns = merged["mn"].to_numpy(zero_copy_only=False)
        mxs = merged["mx"].to_numpy(zero_copy_only=False)
        regs = (merged["reg"].to_pylist() if use_hll
                else [None] * len(cols))
        def _nan_min(a, b):
            return b if np.isnan(a) else (a if np.isnan(b) else min(a, b))

        def _nan_max(a, b):
            return b if np.isnan(a) else (a if np.isnan(b) else max(a, b))

        for c, n, nl, mn, mx, rg in zip(cols, ns, nulls, mns, mxs, regs):
            pn, pnl, pmn, pmx = agg.get(c, (0, 0, np.nan, np.nan))
            agg[c] = (pn + int(n), pnl + int(nl),
                      _nan_min(pmn, mn), _nan_max(pmx, mx))
            if use_hll:
                h = HyperLogLog.from_registers(
                    np.frombuffer(rg, dtype=np.uint8), hll_p)
                hlls[c] = h if c not in hlls else hlls[c].merge(h)

    n_distinct = {}
    if distinct == "exact":
        for c in columns:
            # nulls are excluded (SQL count(DISTINCT) semantics), and
            # Dataset.unique returns None on a fully-empty dataset
            narrow = ds.select_columns([c]).map_batches(
                lambda b, col=c: b.filter(pc.is_valid(b[col])),
                batch_format="pyarrow")
            uniq = narrow.unique(c)
            n_distinct[c] = len(uniq) if uniq is not None else 0
    elif use_hll:
        # empty input produces no partials: 0 distinct, matching the
        # exact tier (-1 is reserved for distinct="none")
        n_distinct = {c: (int(round(hlls[c].estimate()))
                          if c in hlls else 0) for c in columns}

    return pa.table({
        "column": pa.array(columns, pa.string()),
        "n_rows": pa.array([agg.get(c, (0, 0))[0] for c in columns],
                           pa.int64()),
        "n_nulls": pa.array([agg.get(c, (0, 0))[1] for c in columns],
                            pa.int64()),
        "min_val": pa.array([agg.get(c, (0, 0, np.nan))[2]
                             for c in columns], pa.float64()),
        "max_val": pa.array([agg.get(c, (0, 0, np.nan, np.nan))[3]
                             for c in columns], pa.float64()),
        "n_distinct": pa.array([n_distinct.get(c, -1) for c in columns],
                               pa.int64()),
    }, schema=PROFILE_SCHEMA)
