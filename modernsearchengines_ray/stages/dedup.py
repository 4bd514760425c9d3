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

#: per-worker-process MinHasher cache (the permutation family is
#: deterministic, so one instance per (num_perm) serves every task)
_HASHERS: dict[int, MinHasher] = {}


def _hasher(num_perm: int) -> MinHasher:
    h = _HASHERS.get(num_perm)
    if h is None:
        h = _HASHERS[num_perm] = MinHasher(num_perm=num_perm)
    return h


class MinHashBands:
    """Batch fn: text -> exploded (band_key, doc id) rows.

    Works as a task-pool function too (the hasher is a per-process
    cached singleton — cheap deterministic state, no actor needed)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 128, num_bands: int = 16, shingle_n: int = 3):
        self.hasher = _hasher(num_perm)
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
                             concurrency: int | None = None):
    """Dataset -> (doc_id, dup_root): dup_root = min id over every band
    bucket the doc lands in (one-hop single-link, as before).

    Shape: map-side per-batch (band_key, min_id) partials -> driver
    Arrow group_by min -> broadcast {band_key: min_id} -> map-side
    per-doc min over its bands.  No per-group Python: a naive
    ``groupby(band_key).map_groups`` invokes pandas once per bucket and
    buckets are overwhelmingly singletons (measured 5.9s at 500 docs,
    all overhead).  Scale path: when the winner map outgrows the
    driver, the two reduces become hash-partitioned ``groupby``s —
    the map-side kernels are unchanged."""
    import ray

    def bands_task(batch: pa.Table) -> pa.Table:
        fn = MinHashBands(id_col=id_col, text_col=text_col,
                          num_perm=num_perm, num_bands=num_bands)
        return fn(batch)

    kwargs = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    bands = ds.map_batches(bands_task, **kwargs)

    def batch_min(batch: pa.Table) -> pa.Table:
        return batch.group_by("band_key").aggregate([(id_col, "min")])

    refs = bands.map_batches(batch_min, batch_format="pyarrow") \
        .to_arrow_refs()
    partials = pa.concat_tables(ray.get(refs))
    winners = partials.group_by("band_key") \
        .aggregate([(f"{id_col}_min", "min")])
    win_map = dict(zip(winners["band_key"].to_pylist(),
                       winners[f"{id_col}_min_min"].to_pylist()))
    win_ref = ray.put(win_map)

    def doc_root(batch: pa.Table) -> pa.Table:
        # per-batch PARTIAL: a doc's bands may straddle batches, so the
        # same id can emit several rows — consumers min-reduce per id
        wins = ray.get(win_ref)
        df = pa.table({
            id_col: batch[id_col],
            "dup_root": pa.array(
                [wins[k] for k in batch["band_key"].to_pylist()], pa.int64()
            ),
        })
        return df.group_by(id_col).aggregate([("dup_root", "min")]) \
            .rename_columns([id_col, "dup_root"])

    return bands.map_batches(doc_root, batch_format="pyarrow")


# -- simhash hamming-radius near-dup (band rotation LSH) -------------------

def _simhash_bands(value: int, num_bands: int = 4) -> list[str]:
    """Split the 64-bit hash into ``num_bands`` equal bands.

    Pigeonhole guarantee: two hashes within hamming distance
    ``num_bands - 1`` agree on at least one band, so banding finds every
    pair with distance <= 3 at the default 4x16 split."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [f"{b}:{(value >> (b * width)) & mask:x}" for b in range(num_bands)]


def _simhash_id_rows(ds, id_col: str, text_col: str):
    """Map stage: one (id, simhash) row per doc."""
    def hash_rows(batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "simhash": pa.array(hashes, pa.uint64()),
        })

    return ds.map_batches(hash_rows, batch_format="pyarrow")


def _hash_components(values: list[int], radius: int,
                     num_bands: int) -> dict[int, int]:
    """Union-find over DISTINCT simhash values: edges where two values
    share a band AND verify hamming <= radius.  Returns value -> root
    value.  Work is quadratic only within collision buckets of distinct
    values — exact-dup masses collapse to one value first."""
    root_of = {v: v for v in values}

    def find(v: int) -> int:
        while root_of[v] != v:
            root_of[v] = root_of[root_of[v]]
            v = root_of[v]
        return v

    buckets: dict[str, list[int]] = {}
    for v in values:
        for key in _simhash_bands(v, num_bands):
            buckets.setdefault(key, []).append(v)
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if hamming_distance(a, b) <= radius:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        root_of[rb] = ra
    return {v: find(v) for v in values}


def simhash_near_duplicate_pairs(ds, id_col: str = "doc_id",
                                 text_col: str = "text", radius: int = 3,
                                 num_bands: int = 4) -> pd.DataFrame:
    """(id, dup_root) for every doc; dup_root = min id of the doc's
    hamming-<=radius hash component.

    Map stage hashes; the driver reduces over DISTINCT hash values
    (banding + verified union-find — tiny after exact collapse).
    Scale path: the distinct-hash reduce becomes a hash-partitioned
    groupby and components propagate iteratively; map kernels are
    unchanged."""
    import ray

    rows = _simhash_id_rows(ds, id_col, text_col)
    df = pa.concat_tables(ray.get(rows.to_arrow_refs())).to_pandas()
    rep = df.groupby("simhash")[id_col].min()
    comp = _hash_components([int(v) for v in rep.index], radius, num_bands)
    cluster_min: dict[int, int] = {}
    for v, mid in rep.items():
        r = comp[int(v)]
        cluster_min[r] = min(cluster_min.get(r, int(mid)), int(mid))
    return pd.DataFrame({
        id_col: df[id_col],
        "dup_root": [cluster_min[comp[int(h)]] for h in df["simhash"]],
    })


def dedup_simhash_near(ds, id_col: str = "doc_id", text_col: str = "text",
                       radius: int = 3, num_bands: int = 4):
    """Keep one representative (min id) per simhash-hamming-radius
    cluster — same contract as :func:`dedup_minhash`."""
    import ray

    roots = simhash_near_duplicate_pairs(ds, id_col=id_col, text_col=text_col,
                                         radius=radius, num_bands=num_bands)
    keep_ids = set(roots.loc[roots[id_col] == roots["dup_root"], id_col])
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

    def bands_task(batch: pa.Table) -> pa.Table:
        fn = MinHashBands(id_col=id_col, text_col=text_col,
                          num_perm=num_perm, num_bands=num_bands,
                          shingle_n=shingle_n)
        return fn(batch)

    bands = ds.map_batches(bands_task, batch_format="pyarrow")

    # driver reduce over collision buckets only (scale path: partitioned
    # groupby); a Dataset groupby would invoke Python per bucket and
    # buckets are overwhelmingly singletons
    import ray as _ray

    bdf = pa.concat_tables(_ray.get(bands.to_arrow_refs())).to_pandas()
    sizes = bdf.groupby("band_key")[id_col].transform("nunique")
    collisions = bdf[sizes >= 2]
    a_out, b_out = [], []
    for _, group in collisions.groupby("band_key"):
        ids = sorted(set(group[id_col]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    pairs = pd.DataFrame({"id_a": a_out, "id_b": b_out}) \
        .drop_duplicates(ignore_index=True)
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

def embedding_lsh_candidate_pairs(ds, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  threshold: float = 0.95,
                                  num_tables: int = 8,
                                  hyperplanes_per_table: int = 12,
                                  seed: int = 42) -> pd.DataFrame:
    """Random-hyperplane LSH (Charikar 2002 SimHash for angles): the
    bucketed SCALE path for cosine near-dup — no all-pairs matrix.

    Each of ``num_tables`` hash tables buckets vectors by the sign
    pattern of ``hyperplanes_per_table`` random projections; two
    vectors at angle θ collide in one table with prob
    (1 - θ/π)^h, so candidates survive with prob
    1-(1-p)^T (≥ 0.95-cosine pairs: ~0.89 at the 8x12 default).
    Candidates are verified with the exact cosine.  Returns verified
    (id_a, id_b, cos_sim) pairs, id_a < id_b."""
    import ray

    rng = np.random.RandomState(seed)
    sample = ds.limit(1).to_pandas()[vec_col].iloc[0]
    dim = len(sample)
    planes = rng.randn(num_tables, hyperplanes_per_table, dim)
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(hyperplanes_per_table)).astype(np.int64)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = batch[id_col].to_numpy()
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64) \
            .reshape(len(ids), -1)
        out_ids, out_keys = [], []
        for t in range(pl.shape[0]):
            signs = (mat @ pl[t].T) > 0                # n x h
            codes = signs.astype(np.int64) @ weights
            out_ids.extend(ids.tolist())
            out_keys.extend((np.int64(t) << np.int64(32)) + codes)
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "bucket": pa.array(out_keys, pa.int64()),
        })

    buckets = ds.map_batches(bucket_rows, batch_format="pyarrow")
    bdf = pa.concat_tables(
        __import__("ray").get(buckets.to_arrow_refs())).to_pandas()
    sizes = bdf.groupby("bucket")[id_col].transform("nunique")
    collisions = bdf[sizes >= 2]
    cand = set()
    for _, group in collisions.groupby("bucket"):
        ids = sorted(set(group[id_col]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    if not cand:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "cos_sim": pd.array([], dtype="float64")})

    # exact verification: fetch only candidate vectors
    wanted = {i for pair in cand for i in pair}
    wanted_ref = ray.put(wanted)

    def project(batch: pa.Table) -> pa.Table:
        keep = ray.get(wanted_ref)
        mask = pa.array([v in keep for v in batch[id_col].to_pylist()],
                        pa.bool_())
        return batch.select([id_col, vec_col]).filter(mask)

    vdf = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    vecs = {i: np.asarray(v, dtype=np.float64)
            for i, v in zip(vdf[id_col], vdf[vec_col])}
    rows = []
    for a, b in sorted(cand):
        va, vb = vecs[a], vecs[b]
        sim = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if sim >= threshold:
            rows.append((a, b, round(sim, 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cos_sim"]) \
        if rows else pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                                   "id_b": pd.array([], dtype="int64"),
                                   "cos_sim": pd.array([], dtype="float64")})


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
    import ray

    roots = minhash_duplicate_groups(ds, id_col=id_col, text_col=text_col,
                                     **kwargs)
    partials = pa.concat_tables(ray.get(roots.to_arrow_refs()))
    final = partials.group_by(id_col).aggregate([("dup_root", "min")])
    ids = final[id_col].to_pylist()
    keep_ids = {i for i, r in zip(ids, final["dup_root_min"].to_pylist())
                if i == r}
    keep_ref = ray.put(keep_ids)

    def filter_keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(keep_ref)
        mask = pa.array([v in ids for v in batch[id_col].to_pylist()], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(filter_keep, batch_format="pyarrow")
