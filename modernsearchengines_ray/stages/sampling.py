"""Group-capped sampling: keep at most N rows per group, chosen
deterministically.

The C4/web-curation primitive "cap pages per domain": without a cap, a
handful of template-heavy domains dominate the training mix.  The keep
rule is the N smallest (knuth_hash(id), id) per group — a pure
function of the row, so the SAME rows survive on any cluster size, any
block order, any retry, with no RNG state and no coordination
(contrast reservoir sampling, whose result depends on arrival order).

Plan: the per-block kernel keeps the N best rows per group seen in the
block (a map-side combine — at most N rows per (block, group) leave
the block); the partials are ASSOCIATIVE, so

- ``reduce="driver"`` folds them in one driver pass (test scale);
- ``reduce="partitioned"`` hash-repartitions partials by group and
  re-applies the same kernel per block — zero driver state, the
  10^12-row tier.  Both tiers are bit-identical.

The hash is the Knuth multiplicative hash (id * 2654435761 mod 2^32) —
the same reproducible-sampling primitive as stratified_sample, and
exactly expressible in SQL for the oracle gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH_MULT = 2654435761


def _keep_topn_block(batch: pa.Table, group_col: str, id_col: str,
                     n: int, group_type: pa.DataType) -> pa.Table:
    """Vectorized kernel: keep the n smallest (hash, id) per group."""
    if batch.num_rows == 0 or batch.num_columns == 0:
        return pa.schema([(group_col, group_type),
                          (id_col, pa.int64())]).empty_table()
    groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = (ids.astype(np.uint64) * np.uint64(KNUTH_MULT)) \
        & np.uint64(0xFFFFFFFF)
    order = np.lexsort((ids, h, groups))
    g_s, id_s = groups[order], ids[order]
    new = np.ones(len(g_s), dtype=bool)
    new[1:] = g_s[1:] != g_s[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(g_s)) - np.repeat(starts, np.diff(
        np.append(starts, len(g_s))))
    keep = rank < n
    return pa.table({
        group_col: pa.array(list(g_s[keep]), group_type),
        id_col: pa.array(id_s[keep], pa.int64()),
    })


def temperature_sample(ds, group_col: str, id_col: str,
                       permille_scale: int = 1000):
    """Temperature-based mixture rebalancing (the multilingual-LM
    reweighting primitive, temperature T=2 i.e. p ∝ n^(1/2)): keep
    each group-``k`` row with probability ∝ 1/sqrt(n_k), normalized so
    the SMALLEST group keeps everything — large groups downsample
    toward the sqrt-flattened distribution.

    Determinism contract: the keep decision is
    ``knuth_bucket(id) % permille_scale < floor(permille_scale *
    sqrt(n_min / n_k))`` — group counts come from one tiny
    ``groupby(group).count()`` (broadcast once), sqrt is the
    IEEE-correctly-rounded hardware op (bit-identical in numpy and
    SQL, unlike pow), and the floor()ed integer rate makes the
    per-row comparison exact.  Same rows survive on any cluster size
    / block order; no RNG state; one streaming filter, no data
    shuffle.  Returns a Dataset (id_col, group_col)."""
    import ray

    from ray.data.aggregate import Count

    counts = ds.select_columns([group_col]) \
        .groupby(group_col).aggregate(Count(alias_name="n")).take_all()
    if not counts:
        return ds.select_columns([id_col, group_col])
    n_by_group = {r[group_col]: r["n"] for r in counts}
    n_min = min(n_by_group.values())
    rates = {g: int(np.floor(permille_scale * np.sqrt(n_min / n)))
             for g, n in n_by_group.items()}
    rates_ref = ray.put(rates)

    def keep(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bucket = ((ids * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)) \
            % np.uint64(permille_scale)
        lim = np.array([r[g] for g in batch[group_col].to_pylist()],
                       dtype=np.uint64)
        return batch.select([id_col, group_col]).filter(
            pa.array(bucket < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_group(ds, group_col: str, id_col: str, n: int,
                  reduce: str = "driver",
                  num_partitions: int | None = None,
                  group_type: pa.DataType = pa.string()):
    """Keep at most ``n`` rows per ``group_col`` value, deterministic
    across cluster sizes (see module docstring).  ``group_type`` is
    the Arrow type of the group column (string domains by default;
    pass e.g. ``pa.int64()`` for integer groups).  Returns a Dataset
    (partitioned tier) or pyarrow Table (driver tier) with columns
    (group_col, id_col)."""
    import ray
    import ray.data as rd

    from .dedup import default_join_partitions, hash_shuffle_context

    if n <= 0:
        raise ValueError("n must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        return _keep_topn_block(batch, group_col, id_col, n, group_type)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")

    if reduce == "partitioned":
        nparts = num_partitions or default_join_partitions()
        out_schema = pa.schema([(group_col, group_type),
                                (id_col, pa.int64())])
        with hash_shuffle_context():
            shuffled = parts_ds.repartition(nparts, keys=[group_col],
                                            sort=False)
            return rd.from_arrow(out_schema.empty_table()).union(
                shuffled.map_batches(partial, batch_size=None,
                                     batch_format="pyarrow"))
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    tabs = [t for t in ray.get(parts_ds.to_arrow_refs()) if t.num_columns]
    if not tabs:
        return pa.schema([(group_col, group_type),
                          (id_col, pa.int64())]).empty_table()
    return _keep_topn_block(pa.concat_tables(tabs), group_col, id_col, n,
                            group_type)


def token_budget_sample(ds, group_col: str, id_col: str,
                        token_col: str, budget_tokens: float,
                        permille_scale: int = 1000):
    """Budget-constrained mixture sampling: keep rows so each group's
    expected token mass lands at its share of ``budget_tokens``
    (equal split across groups, the data-mix budgeting primitive for
    LM training runs — "give every source the same token allowance").

    Per-group keep rate = ``min(1, share / group_tokens)`` with
    ``share = budget_tokens / n_groups``, applied with the same
    floor()ed-integer-permille Knuth-hash rule as
    :func:`temperature_sample` — deterministic on any cluster size /
    block order, no RNG state, one tiny groupby(group).sum(tokens)
    broadcast + one streaming filter.  The rate arithmetic
    (``permille_scale * (budget / n_groups) / group_tokens``) is in
    the exact operation order a SQL oracle can mirror.  Returns a
    Dataset (id_col, group_col, token_col)."""
    import ray
    from ray.data.aggregate import Sum

    totals = ds.select_columns([group_col, token_col]) \
        .groupby(group_col) \
        .aggregate(Sum(token_col, alias_name="tok")).take_all()
    if not totals:
        return ds.select_columns([id_col, group_col, token_col])
    n_groups = len(totals)
    rates = {
        r[group_col]: min(
            permille_scale,
            int(np.floor(permille_scale * (budget_tokens / n_groups)
                         / float(r["tok"]))))
        for r in totals
    }
    rates_ref = ray.put(rates)

    def keep(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bucket = ((ids * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)) \
            % np.uint64(permille_scale)
        lim = np.array([r[g] for g in batch[group_col].to_pylist()],
                       dtype=np.uint64)
        return batch.select([id_col, group_col, token_col]).filter(
            pa.array(bucket < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def distribution_match_sample(ds, value_col: str, id_col: str,
                              boundaries, target_shares,
                              permille_scale: int = 1000):
    """Importance-resampling to a TARGET bucket distribution (the
    data-mixing primitive: reshape a corpus's length/quality histogram
    toward a reference distribution by per-bucket rejection).

    Buckets are fixed ``boundaries`` cut-points over ``value_col``
    (bucket i = searchsorted position, len(boundaries)+1 buckets);
    ``target_shares[i]`` is the desired mass of bucket i.  Acceptance
    is the classic rejection-sampling rate, normalized so the most
    under-represented bucket keeps everything:

        a_b = (t_b / n_b) / max_c (t_c / n_c)
        keep iff knuth_bucket(id) % permille_scale
                 < floor(permille_scale * a_b)

    Determinism contract: bucket counts come from one tiny
    ``groupby(bucket).count()`` broadcast once; every arithmetic step
    (two divisions, one multiply, floor) is an IEEE-correctly-rounded
    double op written in the SAME expression order as the SQL oracle,
    so the integer permille rates — and therefore the kept set — gate
    hash-exact on any cluster size / block order.  One streaming
    filter, no data shuffle.  Returns (id_col, bucket)."""
    import ray

    from ray.data.aggregate import Count

    bounds = np.asarray(boundaries, dtype=np.float64)
    targets = np.asarray(target_shares, dtype=np.float64)
    assert len(targets) == len(bounds) + 1

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        bucket = np.searchsorted(bounds, v, side="right")
        return pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    counts = bucketed.select_columns(["bucket"]) \
        .groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    if not counts:
        return bucketed
    ratio = {r["bucket"]: targets[r["bucket"]] / float(r["n"])
             for r in counts}
    rmax = max(ratio.values())
    rates = {b: int(np.floor(permille_scale * (x / rmax)))
             for b, x in ratio.items()}
    rates_ref = ray.put(rates)

    def keep(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = ((ids * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)) \
            % np.uint64(permille_scale)
        lim = np.array([r[b] for b in
                        batch["bucket"].to_numpy(zero_copy_only=False)],
                       dtype=np.uint64)
        return batch.filter(pa.array(h < lim))

    return bucketed.map_batches(keep, batch_format="pyarrow")
