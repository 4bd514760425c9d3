#!/usr/bin/env python
"""Index maintenance job — deletes, purge, compaction.

    # tombstone documents (serving filters them immediately)
    ray job submit --working-dir . -- \
        python jobs/maintain_index_job.py --workdir /data/work \
            delete --ids 123 456 --batch-id takedown-2026-08-17

    # physically remove tombstoned docs (exact: equals a fresh build
    # over the remaining corpus; requires the build's --keep-runs)
    python jobs/maintain_index_job.py --workdir /data/work purge

    # force-merge posting segments (after incremental updates):
    # identical ranking, tighter WAND pruning, fewer decode segments
    python jobs/maintain_index_job.py --workdir /data/work compact

The three subcommands are the operational lifecycle the reference
engine lacks (its index is build-once): see pipelines/delete.py and
pipelines/compact.py for semantics and crash-safety. Prints one JSON
line with the operation's metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", required=True,
                        help="the build job's workdir (holds index/)")
    sub = parser.add_subparsers(dest="op", required=True)

    p_del = sub.add_parser("delete", help="tombstone doc ids")
    p_del.add_argument("--ids", type=int, nargs="+",
                       help="doc ids to tombstone")
    p_del.add_argument("--ids-parquet",
                       help="parquet file with a doc_id column instead")
    p_del.add_argument("--batch-id", required=True,
                       help="stable name for this delete batch "
                            "(idempotent re-runs)")

    p_purge = sub.add_parser("purge", help="apply tombstones physically")
    p_purge.add_argument("--merge-salts", type=int, default=1)
    p_purge.add_argument("--docstore",
                         help="also drop the docs from this docstore dir")
    p_purge.add_argument("--docstore-partitions", type=int, default=32)

    sub.add_parser("compact", help="merge posting segments per term")
    sub.add_parser("check", help="verify index integrity (CheckIndex)")

    args = parser.parse_args()
    index_dir = os.path.join(args.workdir, "index")

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    t0 = time.perf_counter()
    if args.op == "delete":
        from modernsearchengines_ray.pipelines.delete import delete_docs

        ids = list(args.ids or [])
        if args.ids_parquet:
            import pyarrow.parquet as pq

            ids += pq.read_table(
                args.ids_parquet, columns=["doc_id"]
            )["doc_id"].to_pylist()
        if not ids:
            parser.error("delete needs --ids or --ids-parquet")
        n = delete_docs(index_dir, ids, batch_id=args.batch_id)
        result = {"op": "delete", "tombstoned": n}
    elif args.op == "purge":
        from modernsearchengines_ray.pipelines.delete import purge_deletes
        from modernsearchengines_ray.state.tombstones import (
            read_tombstones,
        )

        # snapshot the ledger first: purge clears it on success, and
        # the docstore drop below wants the same id set
        ledger = read_tombstones(index_dir)
        result = {"op": "purge",
                  **purge_deletes(index_dir,
                                  merge_salts=args.merge_salts)}
        if args.docstore and len(ledger):
            from modernsearchengines_ray.state.docstore import (
                compact_docstore,
            )

            result["docstore_dropped"] = compact_docstore(
                args.docstore, ledger,
                num_partitions=args.docstore_partitions)
    elif args.op == "compact":
        from modernsearchengines_ray.pipelines.compact import compact_index

        result = {"op": "compact", **compact_index(index_dir)}
    else:
        from modernsearchengines_ray.pipelines.check import check_index

        result = {"op": "check", **check_index(index_dir)}

    result["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
