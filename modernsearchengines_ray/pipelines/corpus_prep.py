"""Corpus preparation: pages -> deduplicated english working corpus.

The reference's ``establish_workingDB``
(/root/reference/WebCrawler_basis.py:311-362): full crawler-table scan
-> language filter -> simhash -> O(n²) duplicate detection -> first-wins
removal -> row-by-row insert.  Here it is one lazy Dataset chain:

  read_parquet (pruned columns) -> extract (M1-M3) -> filter english
  (M5) + url-extension filter (M6) -> exact-simhash dedup as a
  groupby(simhash) keep-min(url) (D1-D3, deterministic keep rule) ->
  doc-id assignment.

doc_id rule (FIXTURES.md §5): dense rank of url under lexicographic
sort over the post-dedup corpus — implemented with a driver-side sorted
url pull (conformance scale); ``mode="hash"`` is the 10^12-doc path
(stable 63-bit url hash, no global sort, collision-checked offline).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.hashing import stable_hash64
from ..stages.dedup import dedup_exact_simhash
from ..stages.extract import extract_pages


def filter_english(ds):
    """Keep rows whose page lang starts with 'en' (WebCrawler_basis.py:227)."""
    return ds.map_batches(
        lambda b: b.filter(pa.compute.match_substring_regex(b["lang"], "^en")),
        batch_format="pyarrow",
    )


def assign_doc_ids(ds, mode: str = "dense_rank"):
    """Attach int64 ``doc_id``.

    - dense_rank: rank of url in the lexicographically sorted url set
      (deterministic, matches the oracle; driver pulls ONLY the url
      column — conformance-scale path).
    - hash: stable 63-bit hash of url — the shuffle-free scale path.
    """
    if mode == "hash":
        def add_hash_id(batch: pa.Table) -> pa.Table:
            ids = [stable_hash64(u) & 0x7FFFFFFFFFFFFFFF
                   for u in batch["url"].to_pylist()]
            return batch.append_column("doc_id", pa.array(ids, pa.int64()))
        return ds.map_batches(add_hash_id, batch_format="pyarrow")

    urls = sorted(
        ds.select_columns(["url"]).to_pandas()["url"].tolist()
    )
    rank = {url: i for i, url in enumerate(urls)}
    rank_ref = ray.put(rank)

    def add_rank_id(batch: pa.Table) -> pa.Table:
        lookup = ray.get(rank_ref)
        ids = [lookup[u] for u in batch["url"].to_pylist()]
        return batch.append_column("doc_id", pa.array(ids, pa.int64()))

    return ds.map_batches(add_rank_id, batch_format="pyarrow")


def prepare_corpus(pages_ds, doc_id_mode: str = "dense_rank",
                   extract_concurrency=None):
    """pages(url, warc_ts, html, ...) -> (doc_id, url, text, lang, site, ...)."""
    ds = extract_pages(pages_ds, concurrency=extract_concurrency)
    ds = filter_english(ds)
    ds = dedup_exact_simhash(ds, keep_key="url")
    return assign_doc_ids(ds, mode=doc_id_mode)


def prepare_corpus_staged(pages_ds, workdir: str,
                          doc_id_mode: str = "hash"):
    """Staged corpus prep with persisted intermediates (the reference's
    own lineage: crawl -> web_crawler.db -> search.db,
    /root/reference/WebCrawler_basis.py:311-362).

    Stage A streams extract once and writes ``extracted/`` parquet
    (html dropped); the dedup winner pass and the final filtered write
    then both read the cheap extracted parquet instead of re-running
    extraction — a lazy single chain would re-execute the extractor
    per consumer.  Returns the corpus parquet directory.
    """
    import os

    import ray.data as rd

    extracted_dir = os.path.join(workdir, "extracted")
    corpus_dir = os.path.join(workdir, "corpus")
    extract_pages(pages_ds).write_parquet(extracted_dir)

    ds = rd.read_parquet(extracted_dir)
    ds = filter_english(ds)
    ds = dedup_exact_simhash(ds, keep_key="url")
    ds = assign_doc_ids(ds, mode=doc_id_mode)
    ds.write_parquet(corpus_dir)
    return corpus_dir
