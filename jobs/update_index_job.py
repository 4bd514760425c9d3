#!/usr/bin/env python
"""Incremental index update job — the `ray job submit` entry point.

    ray job submit --working-dir . -- \
        python jobs/update_index_job.py \
            --pages /data/new_pages --workdir /data/work \
            --delta-id crawl-2026-08 [--merge-salts 4]

Adds a new batch of pages to an index previously built by
build_index_job.py with --keep-runs: extract/dedup/tokenize/spill run
over the DELTA only, then every shard re-merges from the union of run
files (BM25 depends on the global corpus stats, recomputed exactly).
Rerunning with the same --delta-id resumes/no-ops; a new --delta-id
appends more documents.

Doc ids are url hashes (doc_id_mode="hash"), so delta ids never
collide with base ids as long as urls are new — this job is ADD-only
(see pipelines.build_index.update_index).

Prints one JSON line with the update metrics.
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
    parser.add_argument("--pages", required=True,
                        help="DELTA pages parquet path/dir (url, html, ...)")
    parser.add_argument("--format", default="parquet",
                        choices=["parquet", "jsonl", "csv", "warc"])
    parser.add_argument("--workdir", required=True,
                        help="the build job's workdir (holds index/)")
    parser.add_argument("--delta-id", required=True,
                        help="stable name for this batch of additions")
    parser.add_argument("--num-shards", type=int, default=64,
                        help="must match the base index")
    parser.add_argument("--merge-salts", type=int, default=1)
    parser.add_argument("--num-blocks", type=int, default=None,
                        help="override read parallelism (default: 4x CPUs)")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import update_index
    from modernsearchengines_ray.pipelines.corpus_prep import (
        prepare_corpus_streaming,
    )
    from modernsearchengines_ray.sources.readers import (
        read_pages,
        read_pages_warc,
    )

    nblocks = args.num_blocks
    if nblocks is None:
        nblocks = int(ray.cluster_resources().get("CPU", 8)) * 4

    t0 = time.perf_counter()
    if args.format == "warc":
        import glob

        paths = sorted(
            glob.glob(os.path.join(args.pages, "*.warc*"))
            if os.path.isdir(args.pages) else [args.pages])
        pages = read_pages_warc(paths)
    else:
        pages = read_pages(args.pages, format=args.format,
                           override_num_blocks=nblocks)
    # delta prep gets its own scratch dir; hash doc ids so delta ids
    # never collide with base ids for new urls
    delta_work = os.path.join(args.workdir, f"delta-{args.delta_id}")
    corpus = prepare_corpus_streaming(pages, delta_work,
                                      doc_id_mode="hash",
                                      num_blocks=nblocks)
    result = update_index(
        corpus,
        os.path.join(args.workdir, "index"),
        delta_id=args.delta_id,
        cfg=IndexConfig(num_shards=args.num_shards),
        merge_salts=args.merge_salts,
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
