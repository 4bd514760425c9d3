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

import numpy as np

from ..functions.hashing import text_fingerprint
from ..functions.minhash import MinHasher, word_shingles
from ..functions.simhash import hamming_distance, simhash64


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


# -- simhash hamming-radius near-dup (band rotation LSH) -------------------

def _simhash_bands(value: int, num_bands: int = 4) -> list[str]:
    """Split the 64-bit hash into ``num_bands`` equal bands.

    Pigeonhole guarantee: two hashes within hamming distance
    ``num_bands - 1`` agree on at least one band, so banding finds every
    pair with distance <= 3 at the default 4x16 split."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [f"{b}:{(value >> (b * width)) & mask:x}" for b in range(num_bands)]


def simhash_near_duplicate_pairs(ds, id_col: str = "doc_id",
                                 text_col: str = "text", radius: int = 3,
                                 num_bands: int = 4):
    """(id, dup_root) pairs for docs within simhash hamming <= radius.

    shingle -> simhash -> band rotation -> bucket groupby -> in-bucket
    hamming verification over DISTINCT hash values (exact-dup groups
    collapse to one representative, so bucket work is quadratic only in
    distinct near-misses, not in duplicates)."""
    def band_rows(batch: pa.Table) -> pa.Table:
        ids_out, keys_out, hashes_out = [], [], []
        for doc_id, text in zip(batch[id_col].to_pylist(),
                                batch[text_col].to_pylist()):
            h = simhash64(text)
            for key in _simhash_bands(h, num_bands):
                ids_out.append(doc_id)
                keys_out.append(key)
                hashes_out.append(h)
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "band_key": pa.array(keys_out, pa.string()),
            "simhash": pa.array(hashes_out, pa.uint64()),
        })

    bands = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        # min id per distinct hash, then hamming-verified union-find
        # over the distinct values only
        rep = group.groupby("simhash")[id_col].min()
        values = list(rep.index)
        root_of = {v: v for v in values}

        def find(v):
            while root_of[v] != v:
                root_of[v] = root_of[root_of[v]]
                v = root_of[v]
            return v

        for i in range(len(values)):
            for j in range(i + 1, len(values)):
                if hamming_distance(int(values[i]), int(values[j])) <= radius:
                    ri, rj = find(values[i]), find(values[j])
                    if ri != rj:
                        root_of[rj] = ri
        cluster_min = {}
        for v in values:
            r = find(v)
            cluster_min[r] = min(cluster_min.get(r, rep[v]), rep[v])
        return pd.DataFrame({
            id_col: group[id_col],
            "dup_root": [cluster_min[find(h)] for h in group["simhash"]],
        })

    pairs = bands.groupby("band_key").map_groups(bucket_verify,
                                                 batch_format="pandas")

    def min_root(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [group[id_col].iloc[0]],
                             "dup_root": [group["dup_root"].min()]})

    return pairs.groupby(id_col).map_groups(min_root, batch_format="pandas")


def dedup_simhash_near(ds, id_col: str = "doc_id", text_col: str = "text",
                       radius: int = 3, num_bands: int = 4):
    """Keep one representative per simhash-hamming-radius cluster
    (single-link, one propagation hop — same contract as
    :func:`dedup_minhash`)."""
    import ray

    roots = simhash_near_duplicate_pairs(ds, id_col=id_col, text_col=text_col,
                                         radius=radius, num_bands=num_bands)
    keep = roots.map_batches(
        lambda b: b.filter(pa.compute.equal(b[id_col], b["dup_root"])),
        batch_format="pyarrow",
    ).select_columns([id_col])
    keep_ids = set(keep.to_pandas()[id_col])
    keep_ref = ray.put(keep_ids)

    def filter_keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(keep_ref)
        mask = pa.array([v in ids for v in batch[id_col].to_pylist()],
                        pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(filter_keep, batch_format="pyarrow")


# -- n-gram Jaccard verification of LSH candidates --------------------------

def jaccard_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            threshold: float = 0.8, shingle_n: int = 3,
                            num_perm: int = 128, num_bands: int = 16,
                            concurrency: int = 2):
    """LSH candidate pairs verified by TRUE n-gram Jaccard >= threshold.

    Two phases: (1) MinHash banding proposes candidate pairs (the only
    all-pairs-free way at scale); (2) the candidate ids' texts — and
    only those — are broadcast and each pair's exact shingle Jaccard is
    computed.  Returns (id_a, id_b, jaccard) with id_a < id_b."""
    import ray

    bands = ds.map_batches(
        MinHashBands, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "num_perm": num_perm, "num_bands": num_bands,
                               "shingle_n": shingle_n},
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = bands.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    pairs = pairs.drop_duplicates(ignore_index=True)
    if len(pairs) == 0:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "jaccard": pd.array([], dtype="float64")})

    cand_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    cand_ref = ray.put(cand_ids)

    def project_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        mask = pa.array([v in wanted for v in batch[id_col].to_pylist()],
                        pa.bool_())
        return batch.select([id_col, text_col]).filter(mask)

    texts_df = ds.map_batches(project_candidates,
                              batch_format="pyarrow").to_pandas()
    shingle_map = {
        i: word_shingles(t, shingle_n)
        for i, t in zip(texts_df[id_col], texts_df[text_col])
    }
    from ..functions.minhash import jaccard as exact_jaccard

    scores = [
        exact_jaccard(shingle_map[a], shingle_map[b])
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    pairs = pairs.assign(jaccard=np.round(scores, 6))
    out = pairs[pairs["jaccard"] >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# -- embedding-cosine near-dup ---------------------------------------------

def dedup_embedding_cosine(ds, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95):
    """Keep rows with no LOWER-id row within cosine >= threshold.

    The dominance rule makes the result order-free and SQL-checkable
    (NOT EXISTS over the cross join).  Test-scale path broadcasts the
    full normalized matrix; the 10^12-row path replaces the broadcast
    with LSH/IVF bucket joins (stages/ann.py) — the per-batch kernel is
    unchanged."""
    import ray

    ref_df = ds.select_columns([id_col, vec_col]).to_pandas()
    ref_df = ref_df.sort_values(id_col, ignore_index=True)
    ids = ref_df[id_col].to_numpy()
    mat = np.stack(ref_df[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    broadcast = ray.put((ids, mat))

    def keep_mask(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(broadcast)
        bids = batch[id_col].to_numpy()
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        bmat = flat.reshape(len(bids), -1)
        bmat = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
        sims = bmat @ all_mat.T
        dominated = ((sims >= threshold) & (all_ids[None, :] < bids[:, None])
                     ).any(axis=1)
        return batch.filter(pa.array(~dominated, pa.bool_()))

    return ds.map_batches(keep_mask, batch_format="pyarrow")


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
