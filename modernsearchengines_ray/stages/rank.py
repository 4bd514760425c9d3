"""Distributed GLOBAL prefix computations over a sorted Dataset —
dense numbering (zipWithIndex / ``row_number() OVER (ORDER BY ...)``)
and integer running sums, the window primitives Ray Data lacks
natively.

Both share ONE plan that exploits range-sorted blocks (what
``ds.sort`` produces: blocks hold disjoint key ranges, in order):

1. ONE distributed range sort by the caller's key columns — the same
   exchange SQL's global ORDER BY window needs;
2. pass A: each sorted block emits one summary row
   ``(first key of block, block weight)`` — #blocks rows total, where
   the weight is the block's row count (numbering) or its value sum
   (running sum);
3. the driver sorts that tiny table (#blocks entries, KBs at any
   data scale) into per-block starting offsets and broadcasts the
   ``first key -> offset`` map via ``ray.put``;
4. pass B: each block looks up its own offset by its first row's key
   and adds a local vectorized ``arange`` / ``cumsum`` — a pure
   streaming map, no second exchange.

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


def _ascending_list(descending: bool | list[bool],
                    ncols: int) -> list[bool]:
    if isinstance(descending, bool):
        return [not descending] * ncols
    return [not d for d in descending]


def _typed_empty(in_schema, sorted_ds, out_col: str):
    """Typed empty result Dataset: an empty ``to_pandas`` loses its
    schema, and ``Dataset.schema()`` can be None for an empty dataset,
    so fall back to the first — empty — materialized block's schema."""
    import ray
    import ray.data as rd

    if in_schema is not None:
        base = list(zip(in_schema.names, in_schema.types))
    else:
        tabs = ray.get(sorted_ds.to_arrow_refs())
        first = tabs[0] if tabs else pa.schema([]).empty_table()
        base = list(zip(first.schema.names, first.schema.types))
    schema = pa.schema(base + [(out_col, pa.int64())])
    return rd.from_arrow(schema.empty_table())


def _block_offset_map(summaries, sort_cols: list[str],
                      ascending: list[bool]) -> dict:
    """Driver fold of pass A: order the tiny per-block summary table
    by the SAME key/direction (blocks are range-disjoint, so this
    orders blocks globally — no reliance on block-order preservation
    in the collect) and exclusive-prefix the ``weight`` column into a
    ``repr(first-key tuple) -> starting offset`` map."""
    summaries = summaries.sort_values(sort_cols, ascending=ascending,
                                      kind="mergesort",
                                      ignore_index=True)
    starts = np.concatenate(
        [[0], np.cumsum(summaries["weight"].to_numpy())[:-1]])
    return {
        repr(tuple(_canon(v) for v in row)): int(off)
        for row, off in zip(
            summaries[sort_cols].itertuples(index=False, name=None),
            starts)
    }


def _global_prefix(ds, sort_cols: list[str], out_col: str,
                   block_weight, local_apply,
                   descending: bool | list[bool]):
    """The shared two-pass engine: ``block_weight(batch) -> int`` is
    pass A's per-block summary payload; ``local_apply(batch, offset)
    -> np.ndarray[int64]`` is pass B's vectorized per-block kernel."""
    import ray

    in_schema = ds.schema()
    # pass A runs on the materialized sort output so pass B transforms
    # EXACTLY the blocks that were summarized (re-executing a lazy
    # sort could re-chunk)
    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()

    def summarize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(sort_cols).append_column(
                "weight", pa.array([], pa.int64()))
        return batch.slice(0, 1).select(sort_cols).append_column(
            "weight", pa.array([int(block_weight(batch))], pa.int64()))

    summaries = sorted_ds.map_batches(
        summarize, batch_size=None, batch_format="pyarrow").to_pandas()
    if summaries.empty:
        return _typed_empty(in_schema, sorted_ds, out_col)

    offsets = _block_offset_map(
        summaries, sort_cols,
        _ascending_list(descending, len(sort_cols)))
    offsets_ref = ray.put(offsets)

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], pa.int64()))
        table = ray.get(offsets_ref)
        off = table[repr(_key_tuple(batch, sort_cols, 0))]
        vals = local_apply(batch, off)
        return batch.append_column(out_col, pa.array(vals, pa.int64()))

    return sorted_ds.map_batches(apply, batch_size=None,
                                 batch_format="pyarrow")


def global_row_number(ds, sort_cols: list[str],
                      out_col: str = "row_number",
                      descending: bool | list[bool] = False):
    """Return a Dataset = ``ds`` sorted by ``sort_cols`` with a new
    int64 column ``out_col`` holding the 1-based global rank.  See
    module docstring for the plan and the uniqueness contract."""

    def number(batch: pa.Table, off: int) -> np.ndarray:
        return np.arange(1, batch.num_rows + 1, dtype=np.int64) + off

    return _global_prefix(ds, sort_cols, out_col,
                          block_weight=lambda b: b.num_rows,
                          local_apply=number, descending=descending)


def global_running_sum(ds, sort_cols: list[str], value_col: str,
                       out_col: str = "run_sum",
                       exclusive: bool = True,
                       descending: bool | list[bool] = False):
    """Global running sum of int64 ``value_col`` over the global
    ``sort_cols`` order — ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` (minus the row's own value when ``exclusive``, the
    default).  Values must be integers (associative adds keep every
    tier bit-identical to a sequential SQL accumulate — callers scale
    floats first, the windows.py convention); the sort key must be
    globally unique."""

    def block_sum(batch: pa.Table) -> int:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return int(v.sum())

    def accumulate(batch: pa.Table, off: int) -> np.ndarray:
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        run = np.cumsum(v) + off
        return run - v if exclusive else run

    return _global_prefix(ds, sort_cols, out_col,
                          block_weight=block_sum,
                          local_apply=accumulate, descending=descending)
