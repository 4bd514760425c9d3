#!/usr/bin/env python
"""Index merge job — the `ray job submit` entry point.

    ray job submit --working-dir . -- \
        python jobs/merge_index_job.py \
            --base /data/work-a/index \
            --others /data/work-b/index /data/work-c/index \
            [--num-shards 64] [--merge-salts 4]

Combines indexes built as fully independent jobs (each partition of a
huge corpus indexed by its own build_index_job.py run with
--keep-runs) into the base index — the Lucene
``IndexWriter.addIndexes`` analogue.  The sources' retained run files
are grafted into the base's runs tree (a metadata move on shared
storage), then every shard re-merges over the union with EXACTLY
recomputed global BM25 stats, so the result is logically identical to
one build over the concatenated corpora.  Re-running after a crash or
with an already-merged source resumes/no-ops.

Requires disjoint doc ids across sources.  The build job's url-hash
doc ids are disjoint for disjoint url sets but interleave across the
id space, so this job defaults to --id-check exact (reads the per-doc
docstats ledger); use "range" for contiguous-range partitioned ids
(free) or "off" when the caller owns the guarantee.

Prints one JSON line with the merge metrics.
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
    parser.add_argument("--base", required=True,
                        help="index dir merged INTO (becomes the union)")
    parser.add_argument("--others", required=True, nargs="+",
                        help="index dirs merged in (left untouched)")
    parser.add_argument("--num-shards", type=int, default=64,
                        help="must match every participating index")
    parser.add_argument("--merge-salts", type=int, default=1)
    parser.add_argument("--id-check", default="exact",
                        choices=["range", "exact", "off"],
                        help="doc-id disjointness check: 'exact' reads "
                             "the docstats ledger (right for url-hash "
                             "ids), 'range' compares [min,max] spans, "
                             "'off' skips")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import merge_indexes

    t0 = time.perf_counter()
    result = merge_indexes(
        args.base,
        args.others,
        cfg=IndexConfig(num_shards=args.num_shards),
        merge_salts=args.merge_salts,
        id_check=args.id_check,
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "index_dir": result.index_dir,
        "docs_total": result.stats.num_documents,
        "indexed_total": result.stats.num_indexed,
        "terms": result.terms,
        "postings": result.postings,
        "index_bytes": result.bytes,
        "shards_built": result.shards_built,
        "shards_skipped": result.shards_skipped,
        "wall_sec": round(wall, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
