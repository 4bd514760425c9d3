"""Distributed PageRank (Brin & Page 1998) over an edge Dataset.

The iterative-compute pattern on Ray Data: per iteration, ranks join
the (pre-weighted) edge list on ``src`` (hash shuffle), contributions
``rank × 1/outdeg`` aggregate by ``dst`` (one groupby), and the
teleport term folds in with one map.  Rank state lives as a Dataset —
never on the driver — and materializes once per iteration (the same
fixpoint-iteration shape as stages/dedup.py's label propagation,
weighted).

Assumes no dangling nodes (every node has outdegree ≥ 1).  Callers
with directed data symmetrize first — exactly what the driver entry
does — or add self-loops; a dangling-mass redistribution pass is one
extra aggregate if ever needed, documented rather than built.
"""

from __future__ import annotations

import pyarrow as pa


def pagerank(edges, iters: int = 3, damping: float = 0.85,
             num_partitions: int | None = None,
             reduce: str = "broadcast"):
    """Ranks after ``iters`` power iterations from the uniform vector.

    ``edges``: Dataset with string/int columns (src, dst), assumed
    deduplicated; every node must appear as a ``src`` at least once
    (no dangling).  Returns a Dataset ``(node, rank float64)`` with
    one row per node, unnormalized beyond the standard
    ``(1-d)/N + d·Σ`` recurrence.

    Tiers: ``reduce="broadcast"`` (default) ships the rank vector once
    per iteration via ``ray.put`` and joins edge→rank inside the map —
    right while nodes ≪ edges (a 10⁸-node vector is ~2 GB; beyond
    that flip tiers).  ``reduce="partitioned"`` keeps rank state as a
    Dataset and uses a hash join per iteration — zero driver state at
    any node count.  Both tiers aggregate contributions map-side
    (per-batch dst combine) before the groupby."""
    from ray.data.aggregate import Count, Sum

    from .dedup import default_join_partitions

    if reduce not in ("broadcast", "partitioned"):
        raise ValueError(f"unknown reduce tier: {reduce!r}")
    nparts = num_partitions or default_join_partitions()

    # out-degree → per-edge weight 1/outdeg(src), computed ONCE.
    # deg feeds both the node list and the weight join — materialize;
    # and count nodes BEFORE building the join, so an empty edge list
    # returns a typed empty result instead of tripping Acero's
    # empty-side failure
    deg = edges.groupby("src").aggregate(
        Count(alias_name="outdeg")).materialize()
    nodes = deg.select_columns(["src"]) \
        .rename_columns({"src": "node"}).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        sch = edges.schema()  # Ray Schema wrapper: .names / .types
        src_type = sch.types[sch.names.index("src")]
        return rd.from_arrow(pa.schema(
            [("node", src_type), ("rank", pa.float64())]).empty_table())

    weighted = edges.join(deg, "inner", num_partitions=nparts,
                          on=("src",))

    def weigh(batch: pa.Table) -> pa.Table:
        inv = 1.0 / batch["outdeg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": batch["src"],
            "dst": batch["dst"],
            "w": pa.array(inv, pa.float64()),
        })

    weighted = weighted.map_batches(
        weigh, batch_format="pyarrow").materialize()
    teleport = (1.0 - damping) / n_nodes

    def init(batch: pa.Table) -> pa.Table:
        r = pa.nulls(len(batch), pa.float64()).fill_null(1.0 / n_nodes)
        return pa.table({"node": batch["node"], "rank": r})

    ranks = nodes.map_batches(init, batch_format="pyarrow") \
        .materialize()

    def combine_dst(batch: pa.Table, vals) -> pa.Table:
        """Map-side combine: per-batch contribution sums by dst."""
        import pandas as pd

        df = pd.DataFrame({"node": batch["dst"].to_pandas(),
                           "part": vals})
        agg = df.groupby("node", as_index=False, sort=False)["part"] \
            .sum()
        return pa.table({
            "node": pa.Array.from_pandas(agg["node"]).cast(
                batch.schema.field("dst").type),
            "part": pa.array(agg["part"].to_numpy(), pa.float64()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        acc = batch["acc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch["node"],
            "rank": pa.array(teleport + damping * acc, pa.float64()),
        })

    for _ in range(iters):
        if reduce == "broadcast":
            import ray

            rank_df = ranks.to_pandas()
            rank_ref = ray.put(dict(zip(rank_df["node"],
                                        rank_df["rank"])))

            def contribute(batch: pa.Table, ref=rank_ref) -> pa.Table:
                import numpy as np

                table = ray.get(ref)
                r = np.fromiter(
                    (table[s] for s in batch["src"].to_pylist()),
                    dtype=np.float64, count=len(batch))
                vals = r * batch["w"].to_numpy(zero_copy_only=False)
                return combine_dst(batch, vals)

            summed = weighted.map_batches(
                contribute, batch_format="pyarrow") \
                .groupby("node").aggregate(Sum("part", alias_name="acc"))
        else:
            contrib_src = weighted.rename_columns({"src": "node"}) \
                .join(ranks, "inner", num_partitions=nparts,
                      on=("node",))

            def contribute_joined(batch: pa.Table) -> pa.Table:
                vals = (batch["rank"].to_numpy(zero_copy_only=False)
                        * batch["w"].to_numpy(zero_copy_only=False))
                return combine_dst(batch, vals)

            summed = contrib_src.map_batches(
                contribute_joined, batch_format="pyarrow") \
                .groupby("node").aggregate(Sum("part", alias_name="acc"))

        # symmetric input ⇒ every node receives mass, so the groupby
        # covers all nodes; materialize breaks the lineage per
        # iteration (k rounds never stack into one plan)
        ranks = summed.map_batches(
            fold, batch_format="pyarrow").materialize()

    return ranks
