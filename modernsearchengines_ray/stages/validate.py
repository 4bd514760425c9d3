"""Data-validation / expectations over a Dataset — the pipeline gate
a 100-TB ingest runs BEFORE indexing or training (Great-Expectations
semantics, Ray-Data-native).

Every streaming rule (``not_null``, ``in_range``, ``accepted_values``)
folds into ONE pass: a single ``AggregateFn`` whose accumulator is a
fixed int64 vector ``[n_rows, viol_rule_0, viol_rule_1, ...]`` — each
block computes its violation counts with pyarrow/numpy kernels and
adds; merges add vectors.  The driver only ever holds the vector.
``unique`` rules each need the one exchange uniqueness fundamentally
needs (a ``groupby(col)``): duplicates = n_rows − n_groups, so the
shuffle output collapses to a count, never row data.

Rule semantics (null handling mirrors SQL so the driver gate can
mirror each rule as a ``count(*) FILTER`` expression):

- ``not_null(col)``: violation = row where col IS NULL.
- ``in_range(col, lo, hi)``: violation = non-null value outside
  [lo, hi] (nulls are not range violations — pair with not_null).
- ``accepted_values(col, values)``: violation = non-null value not in
  the set.
- ``unique(col)``: violations = count(*) − count(distinct col).
  Requires a non-null key column (a null key would count as a group
  here but not in SQL's count(distinct) — combine with not_null).

Returns one row per rule, in the caller's rule order:
``(rule string, violations int64, checked int64)`` where checked is
the total row count — counts, not row samples, so the result is
O(rules) regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT_SCHEMA = pa.schema([
    ("rule", pa.string()),
    ("violations", pa.int64()),
    ("checked", pa.int64()),
])


def not_null(col: str, name: str | None = None) -> dict:
    return {"kind": "not_null", "col": col,
            "name": name or f"{col}_not_null"}


def in_range(col: str, lo: float, hi: float,
             name: str | None = None) -> dict:
    return {"kind": "in_range", "col": col, "lo": lo, "hi": hi,
            "name": name or f"{col}_range"}


def accepted_values(col: str, values: tuple,
                    name: str | None = None) -> dict:
    return {"kind": "accepted_values", "col": col,
            "values": tuple(values),
            "name": name or f"{col}_accepted"}


def unique(col: str, name: str | None = None) -> dict:
    return {"kind": "unique", "col": col,
            "name": name or f"{col}_unique"}


def _block_violations(block: pa.Table, rule: dict) -> int:
    col = block.column(rule["col"])
    kind = rule["kind"]
    if kind == "not_null":
        return col.null_count
    if kind == "in_range":
        ok = pc.and_(pc.greater_equal(col, rule["lo"]),
                     pc.less_equal(col, rule["hi"]))
        # non-null AND outside range
        bad = pc.and_(pc.is_valid(col), pc.invert(pc.fill_null(ok, True)))
        return int(pc.sum(bad).as_py() or 0)
    if kind == "accepted_values":
        member = pc.is_in(col, value_set=pa.array(list(rule["values"]),
                                                  col.type))
        bad = pc.and_(pc.is_valid(col), pc.invert(member))
        return int(pc.sum(bad).as_py() or 0)
    raise ValueError(f"unknown rule kind: {kind!r}")


def validate(ds, rules: list[dict]) -> pa.Table:
    """Run the rules against ``ds``; see module docstring."""
    from ray.data.aggregate import AggregateFn

    streaming = [r for r in rules if r["kind"] != "unique"]
    uniques = [r for r in rules if r["kind"] == "unique"]
    cols = sorted({r["col"] for r in rules})
    narrow = ds.select_columns(cols)

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        out = np.zeros(1 + len(streaming), dtype=np.int64)
        out[0] = block.num_rows
        for i, r in enumerate(streaming):
            out[1 + i] = _block_violations(block, r)
        return state + out

    fold = AggregateFn(
        init=lambda _: np.zeros(1 + len(streaming), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        name="validate")
    vec = np.asarray(narrow.aggregate(fold)["validate"], dtype=np.int64)
    n_rows = int(vec[0])

    counts: dict[str, int] = {
        r["name"]: int(vec[1 + i]) for i, r in enumerate(streaming)}
    for r in uniques:
        # duplicates = rows − groups; the groupby output itself is
        # never pulled, only counted
        n_groups = narrow.select_columns([r["col"]]) \
            .groupby(r["col"]).count().count()
        counts[r["name"]] = n_rows - int(n_groups)

    return pa.table({
        "rule": pa.array([r["name"] for r in rules], pa.string()),
        "violations": pa.array([counts[r["name"]] for r in rules],
                               pa.int64()),
        "checked": pa.array([n_rows] * len(rules), pa.int64()),
    })
