"""Index build pipeline: corpus Dataset -> sharded on-disk inverted index.

Stages (all streaming until the shard write):

  corpus(doc_id, text[, url])
    -> corpus stats (map-side partials, no shuffle)          [stats.py]
    -> TokenizePostings actor pool (map-side A1 aggregation) [tokenize.py]
    -> resume filter (drop postings of completed shards)     [manifest.py]
    -> groupby("shard").map_groups(shard writer)             [postings.py]
    -> meta.json + manifest summary

The returned BuildResult carries per-shard metrics from the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import pyarrow as pa

from ..config import DEFAULT_INDEX_CONFIG, IndexConfig
from ..stages.postings import make_shard_writer
from ..stages.stats import CorpusStats, compute_corpus_stats
from ..stages.tokenize import tokenize_postings
from ..state.manifest import completed_shards, read_manifests

META_FILE = "meta.json"


@dataclass
class BuildResult:
    index_dir: str
    stats: CorpusStats
    fingerprint: str
    shards_built: int
    shards_skipped: int
    terms: int
    postings: int
    bytes: int


def _fingerprint(stats: CorpusStats, cfg: IndexConfig, corpus_id: str) -> str:
    payload = json.dumps(
        {
            "corpus_id": corpus_id,
            "n": stats.num_documents,
            "avg": stats.avg_doc_len,
            "k1": cfg.k1,
            "b": cfg.b,
            "min_df": cfg.min_df_exclusive,
            "shards": cfg.num_shards,
            "chunk": cfg.chunk_chars,
            "cap": cfg.max_doc_chars,
            "url_words": cfg.prepend_url_words,
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def write_meta(index_dir: str, stats: CorpusStats, cfg: IndexConfig,
               fingerprint: str) -> None:
    meta = {
        "num_documents": stats.num_documents,
        "avg_doc_len": stats.avg_doc_len,
        "num_indexed": stats.num_indexed,
        "num_shards": cfg.num_shards,
        "k1": cfg.k1,
        "b": cfg.b,
        "min_df_exclusive": cfg.min_df_exclusive,
        "block_size": cfg.block_size,
        "prepend_url_words": cfg.prepend_url_words,
        "fingerprint": fingerprint,
    }
    tmp = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, META_FILE))


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def build_index(
    corpus_ds,
    index_dir: str,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    corpus_id: str = "",
    tokenizer_concurrency=None,
    tokenizer_batch_size: int = 256,
) -> BuildResult:
    """Build (or resume) the sharded index from a corpus Dataset."""
    os.makedirs(index_dir, exist_ok=True)

    stats = compute_corpus_stats(corpus_ds, cfg)
    fingerprint = _fingerprint(stats, cfg, corpus_id)
    done = completed_shards(index_dir, fingerprint)

    postings = tokenize_postings(
        corpus_ds, cfg,
        concurrency=tokenizer_concurrency,
        batch_size=tokenizer_batch_size,
    )

    if done:
        done_list = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pa.compute.is_in(
                batch["shard"], value_set=pa.array(done_list, pa.int32())
            )
            return batch.filter(pa.compute.invert(mask))

        postings = postings.map_batches(drop_done, batch_format="pyarrow")

    # the one wide shuffle: push-based sort shuffle scales markedly better
    # than the default pull-based variant at higher parallelism for this
    # many-blocks / few-groups exchange (measured 19s -> 4.7s at 32 CPUs,
    # sf0.1 x20 replication); hash_shuffle was far worse (93s).
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    previous_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        summary = postings.groupby("shard").map_groups(
            make_shard_writer(index_dir, stats.num_documents,
                              stats.avg_doc_len, cfg, fingerprint),
            batch_format="pyarrow",
        ).to_pandas()
    finally:
        ctx.shuffle_strategy = previous_strategy

    write_meta(index_dir, stats, cfg, fingerprint)

    manifests = read_manifests(index_dir)
    terms = sum(m.row_count for m in manifests.values())
    n_postings = sum(m.postings_count for m in manifests.values())
    nbytes = sum(m.bytes for m in manifests.values())
    return BuildResult(
        index_dir=index_dir,
        stats=stats,
        fingerprint=fingerprint,
        shards_built=len(summary),
        shards_skipped=len(done),
        terms=terms,
        postings=n_postings,
        bytes=nbytes,
    )
