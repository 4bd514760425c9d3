#!/usr/bin/env python
"""Index-build job — the `ray job submit` entry point.

    ray job submit --working-dir . -- \
        python jobs/build_index_job.py \
            --pages /data/pages_parquet --workdir /data/work \
            --num-shards 256 [--merge-salts 4] [--doc-id-mode hash]

Runs the full pages→index pipeline (extract → dedup → tokenize/spill →
shard merge) with streaming execution; rerunning after a failure
resumes from the spill / shard manifests.  On a cluster the job driver
connects to the existing Ray (RAY_ADDRESS); standalone it starts a
local session.

Prints one JSON line with the build metrics (docs, postings, bytes,
wall seconds, shards built/skipped).
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
                        help="pages parquet path/dir (url, warc_ts, html, ...)")
    parser.add_argument("--format", default="parquet",
                        choices=["parquet", "jsonl", "csv", "warc"])
    parser.add_argument("--workdir", required=True,
                        help="output root: extracted/ + index/ land here")
    parser.add_argument("--num-shards", type=int, default=64)
    parser.add_argument("--merge-salts", type=int, default=1)
    parser.add_argument("--doc-id-mode", default="hash",
                        choices=["hash", "dense_rank"])
    parser.add_argument("--num-blocks", type=int, default=None,
                        help="override read parallelism (default: 4x CPUs)")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import build_index
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
        # one task per segment file; a dir of .warc/.warc.gz segments is
        # the Common Crawl layout
        import glob

        paths = sorted(
            glob.glob(os.path.join(args.pages, "*.warc*"))
            if os.path.isdir(args.pages) else [args.pages])
        pages = read_pages_warc(paths)
    else:
        pages = read_pages(args.pages, format=args.format,
                           override_num_blocks=nblocks)
    corpus = prepare_corpus_streaming(pages, args.workdir,
                                      doc_id_mode=args.doc_id_mode,
                                      num_blocks=nblocks)
    result = build_index(
        corpus,
        os.path.join(args.workdir, "index"),
        cfg=IndexConfig(num_shards=args.num_shards),
        corpus_id=args.pages,
        merge_salts=args.merge_salts,
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "index_dir": result.index_dir,
        "docs": result.stats.num_documents,
        "indexed": result.stats.num_indexed,
        "terms": result.terms,
        "postings": result.postings,
        "index_bytes": result.bytes,
        "shards_built": result.shards_built,
        "shards_skipped": result.shards_skipped,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(result.stats.num_documents / wall, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
