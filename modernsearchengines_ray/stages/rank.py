"""Distributed GLOBAL dense numbering of a sorted Dataset — the
zipWithIndex / ``row_number() OVER (ORDER BY ...)`` primitive Ray
Data lacks natively.

The plan exploits range-sorted blocks (what ``ds.sort`` produces:
blocks hold disjoint key ranges, in order):

1. ONE distributed range sort by the caller's key columns — the same
   exchange SQL's global ORDER BY window needs;
2. pass A: each sorted block emits one summary row
   ``(first key of block, rows in block)`` — #blocks rows total;
3. the driver sorts that tiny table (#blocks entries, KBs at any
   data scale) into per-block starting offsets and broadcasts the
   ``first key -> offset`` map via ``ray.put``;
4. pass B: each block looks up its own offset by its first row's key
   and adds a local ``arange`` — a pure streaming map, no second
   exchange.

Correctness requires the sort key to be GLOBALLY UNIQUE (each block's
first key then identifies exactly one block and one global position).
Ties would make the block boundary ambiguous; callers append a unique
tie-break column (the convention everywhere in this repo).  Driver
state is O(#blocks), independent of row count — this scales to any
input that Ray's sort itself can shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _canon(v):
    """Canonical python-native scalar so the worker-side (pyarrow
    ``as_py``) and driver-side (pandas itertuples) key tuples repr
    identically.  Keys are int/float/str by contract (timestamps
    canonicalize to int64 before calling — their repr differs
    between pandas and pyarrow)."""
    return v.item() if hasattr(v, "item") else v


def _key_tuple(batch: pa.Table, cols: list[str], row: int) -> tuple:
    return tuple(_canon(batch.column(c)[row].as_py()) for c in cols)


def global_row_number(ds, sort_cols: list[str],
                      out_col: str = "row_number",
                      descending: bool | list[bool] = False):
    """Return a Dataset = ``ds`` sorted by ``sort_cols`` with a new
    int64 column ``out_col`` holding the 1-based global rank.  See
    module docstring for the plan and the uniqueness contract."""
    import ray

    in_schema = ds.schema()
    sorted_ds = ds.sort(sort_cols, descending=descending)
    # pass A runs on the materialized sort output so pass B numbers
    # EXACTLY the blocks that were summarized (re-executing a lazy
    # sort could re-chunk)
    sorted_ds = sorted_ds.materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        # one row per block: the block's first sort key (native
        # columns) + its row count
        if batch.num_rows == 0:
            return batch.select(sort_cols).append_column(
                "n_rows", pa.array([], pa.int64()))
        return batch.slice(0, 1).select(sort_cols).append_column(
            "n_rows", pa.array([batch.num_rows], pa.int64()))

    summaries = sorted_ds.map_batches(
        summarize, batch_size=None, batch_format="pyarrow").to_pandas()
    if summaries.empty:
        # typed empty result (an empty to_pandas loses its schema;
        # Dataset.schema() can be None for an empty dataset, so fall
        # back to the first — empty — materialized block's schema)
        import ray.data as rd

        if in_schema is not None:
            base = list(zip(in_schema.names, in_schema.types))
        else:
            tabs = ray.get(sorted_ds.to_arrow_refs())
            first = tabs[0] if tabs else pa.schema([]).empty_table()
            base = list(zip(first.schema.names, first.schema.types))
        schema = pa.schema(base + [(out_col, pa.int64())])
        return rd.from_arrow(schema.empty_table())

    # blocks are range-disjoint, so sorting the tiny summary table by
    # the SAME key/direction orders blocks globally — no reliance on
    # any block-order preservation in the collect
    if isinstance(descending, bool):
        ascending = [not descending] * len(sort_cols)
    else:
        ascending = [not d for d in descending]
    summaries = summaries.sort_values(sort_cols, ascending=ascending,
                                      kind="mergesort",
                                      ignore_index=True)
    starts = np.concatenate(
        [[0], np.cumsum(summaries["n_rows"].to_numpy())[:-1]])
    offsets = {
        repr(tuple(_canon(v) for v in row)): int(off)
        for row, off in zip(
            summaries[sort_cols].itertuples(index=False, name=None),
            starts)
    }
    offsets_ref = ray.put(offsets)

    def number(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        table = ray.get(offsets_ref)
        key = repr(_key_tuple(batch, sort_cols, 0))
        off = table[key]
        rn = np.arange(1, batch.num_rows + 1, dtype=np.int64) + off
        return batch.append_column(out_col, pa.array(rn, pa.int64()))

    return sorted_ds.map_batches(number, batch_size=None,
                                 batch_format="pyarrow")


def global_running_sum(ds, sort_cols: list[str], value_col: str,
                       out_col: str = "run_sum",
                       exclusive: bool = True,
                       descending: bool | list[bool] = False):
    """Global running sum of int64 ``value_col`` over the global
    ``sort_cols`` order — ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` (minus the row's own value when ``exclusive``, the
    default) — by the same plan as :func:`global_row_number`: block
    summaries carry per-block VALUE SUMS instead of row counts, the
    driver folds #blocks rows into starting offsets, and pass B adds
    a local vectorized cumsum.  Values must be integers (associative
    adds keep every tier bit-identical to a sequential SQL
    accumulate — callers scale floats first, the windows.py
    convention); the sort key must be globally unique."""
    import ray

    in_schema = ds.schema()
    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(sort_cols).append_column(
                "v_sum", pa.array([], pa.int64()))
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return batch.slice(0, 1).select(sort_cols).append_column(
            "v_sum", pa.array([int(v.sum())], pa.int64()))

    summaries = sorted_ds.map_batches(
        summarize, batch_size=None, batch_format="pyarrow").to_pandas()
    if summaries.empty:
        import ray.data as rd

        if in_schema is not None:
            base = list(zip(in_schema.names, in_schema.types))
        else:
            tabs = ray.get(sorted_ds.to_arrow_refs())
            first = tabs[0] if tabs else pa.schema([]).empty_table()
            base = list(zip(first.schema.names, first.schema.types))
        schema = pa.schema(base + [(out_col, pa.int64())])
        return rd.from_arrow(schema.empty_table())

    if isinstance(descending, bool):
        ascending = [not descending] * len(sort_cols)
    else:
        ascending = [not d for d in descending]
    summaries = summaries.sort_values(sort_cols, ascending=ascending,
                                      kind="mergesort",
                                      ignore_index=True)
    starts = np.concatenate(
        [[0], np.cumsum(summaries["v_sum"].to_numpy())[:-1]])
    offsets = {
        repr(tuple(_canon(v) for v in row)): int(off)
        for row, off in zip(
            summaries[sort_cols].itertuples(index=False, name=None),
            starts)
    }
    offsets_ref = ray.put(offsets)

    def accumulate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], pa.int64()))
        table = ray.get(offsets_ref)
        off = table[repr(_key_tuple(batch, sort_cols, 0))]
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        run = np.cumsum(v) + off
        if exclusive:
            run = run - v
        return batch.append_column(out_col, pa.array(run, pa.int64()))

    return sorted_ds.map_batches(accumulate, batch_size=None,
                                 batch_format="pyarrow")
