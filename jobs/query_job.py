#!/usr/bin/env python
"""Batch-retrieval job — `ray job submit` entry point for serving.

    ray job submit --working-dir . -- \
        python jobs/query_job.py \
            --index /data/work/index --queries queries.txt \
            --out batch_results.txt [--docstore /data/work/docstore] \
            [--num-scorers 8]

Reads tab-separated ``<qnum>\\t<query>`` lines, serves each through the
shard-scorer actor pool with the full reference ranking, and writes the
TREC-style top-100 file (``qn\\trank\\turl\\tscore:.3f``).
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
    parser.add_argument("--index", required=True)
    parser.add_argument("--queries", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--docstore", default=None)
    parser.add_argument("--num-scorers", type=int, default=4)
    parser.add_argument("--lazy-shards", action="store_true",
                        help="row-group-lazy shard loading: actor memory "
                             "= term locator + touched row groups (build "
                             "the index with shard_row_group_size set)")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from modernsearchengines_ray.pipelines.query import run_batched_queries
    from modernsearchengines_ray.state.docstore import DocStore

    docstore = DocStore(args.docstore) if args.docstore else None
    t0 = time.perf_counter()
    out = run_batched_queries(args.queries, args.index, args.out,
                              docstore=docstore,
                              num_scorers=args.num_scorers,
                              lazy_shards=args.lazy_shards)
    lines = sum(1 for _ in open(out))
    print(json.dumps({
        "out": out,
        "result_lines": lines,
        "wall_sec": round(time.perf_counter() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
