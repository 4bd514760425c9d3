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
- n-gram Jaccard verification of candidate pairs,
- embedding-cosine near-dup (hyperplane-LSH candidates + exact verify).

Reduce tiers (EVERY stage in this module takes ``reduce=``: exact
dedup, minhash groups/dedup, simhash-near, jaccard pairs, embedding
LSH pairs):

- ``"driver"`` (default at test scale): map-side per-batch Arrow
  group-min partials -> one driver reduce over the NARROW (hash, key)
  pairs -> broadcast winner table -> vectorized semi-join filter.  The
  wide rows never shuffle; the driver holds one row per unique hash.
- ``"partitioned"`` (the 10^12-doc path): the same map-side partials
  feed distributed ``groupby`` aggregates, winner/candidate sets join
  back via ``Dataset.join`` (hash-shuffle), and iterative pieces
  (minhash label propagation, simhash-near components) carry their
  state as Datasets — NO driver materialization anywhere.  Both modes
  are bit-identical (tested); driver mode stays the default because
  the hash-shuffle fixed overheads (~seconds of aggregator actor
  startup) dwarf the reduce itself below ~10^8 rows.

Winner filters match on the FULL (hash, key) pair, not key membership
alone: with multi-snapshot inputs (same url recrawled, different
content) key-only filtering would keep every row sharing a winning url
and could keep a losing row whose url won a *different* hash group.
Precondition for exact dedup semantics: (hash, key) pairs are unique
per row — rows carrying an identical pair (byte-identical recrawl) all
survive; validate keys with
:func:`modernsearchengines_ray.pipelines.corpus_prep.assert_unique_keys`
at ingestion when that matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowlist import list_matrix
from ..functions.hashing import text_fingerprint
from ..functions.minhash import MinHasher, word_shingles
from ..functions.simhash import hamming_distance, simhash64

def default_join_partitions() -> int:
    """Partition count for the ``reduce="partitioned"`` hash-shuffle
    ops when the caller doesn't pass one: half the cluster's CPUs,
    floor 2 — enough aggregators to keep every node busy without
    spawning more shuffle actors than cores.  Derived from
    ``ray.cluster_resources()`` so the same code sizes itself on a
    4-CPU test session and a 1024-core cluster (a fixed constant
    serializes the shuffle at scale — VERDICT r2 #6); explicit
    ``num_partitions=`` always wins."""
    try:
        import ray

        if ray.is_initialized():
            return max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        pass
    return 2


def join_partitions_for(approx_rows: int,
                        rows_per_partition: int = 1_000_000) -> int:
    """Input-size-aware partition count for hash exchanges.

    Each hash-shuffle exchange spawns ``num_partitions`` aggregator
    actors, and an exchange-heavy pipeline (three exchanges at 16
    partitions) pays ~tens of actor spin-ups that dominate wall time
    on toy inputs (measured: dup_spans at sf0.1 took 27 s at 16
    partitions, 9 s at 4).  Size to ~``rows_per_partition`` exchange
    rows per partition, floor 2, capped at
    :func:`default_join_partitions` (cluster width) — so toy inputs
    spin up 2 aggregators while 10^9-row inputs still use the whole
    cluster.  ``approx_rows`` is a sizing estimate, not semantics:
    order-of-magnitude accuracy is enough."""
    cap = default_join_partitions()
    return max(2, min(cap, int(approx_rows // rows_per_partition) + 1))


def concat_partials(tables: list[pa.Table]) -> pa.Table:
    """Concat map-side partial tables, tolerating the empty-schema
    blocks Ray Data emits for zero-row inputs."""
    real = [t for t in tables if t.num_columns > 0]
    if not real:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables([t for t in real if t.num_rows > 0] or real[:1])


#: sentinel key values no real row can carry: int64 min / NUL-framed
#: string / NUL-framed bytes.  An INNER join drops the sentinel row the
#: moment the other side lacks it (which it always does).
_SENTINEL_INT = -(1 << 63)
_SENTINEL_STR = "\x00msr\x00sentinel\x00"
_SENTINEL_BYTES = b"\x00msr\x00sentinel\x00"


def _sentinel_table(schema: pa.Schema) -> pa.Table:
    cols = {}
    for f in schema:
        if pa.types.is_unsigned_integer(f.type):
            cols[f.name] = pa.array([(1 << 64) - 1], f.type)
        elif pa.types.is_integer(f.type):
            cols[f.name] = pa.array([_SENTINEL_INT], f.type)
        elif pa.types.is_string(f.type):
            cols[f.name] = pa.array([_SENTINEL_STR], f.type)
        elif pa.types.is_binary(f.type):
            cols[f.name] = pa.array([_SENTINEL_BYTES], f.type)
        elif pa.types.is_floating(f.type):
            cols[f.name] = pa.array([float("nan")], f.type)
        else:
            raise TypeError(f"no sentinel for {f.type}")
    return pa.table(cols, schema=schema)


def ensure_schema(ds, schema: pa.Schema, num_blocks: int = 2):
    """Make a groupby output safe to feed into ``Dataset.join``.

    Two Ray quirks conspire against joining small/empty aggregates:
    sort-based groupby emits schema-less zero-row blocks, and the hash
    shuffle never delivers EMPTY shards, so a join partition that
    receives no rows builds a no-column table and Acero fails with
    "No match ... for key field reference" — even a typed-but-empty
    dataset cannot be joined at all.  ``map_batches`` skips zero-row
    blocks, so a normalization UDF never runs.  The structural fix:
    union ONE sentinel row whose key values are outside any real
    domain (guaranteeing every needed block/schema exists) and
    repartition (rebuilding all blocks under the unified schema); the
    inner join then drops the sentinel because the other side never
    contains it.  Callers that RETURN the guarded dataset must filter
    the sentinel back out (see :func:`drop_sentinels`)."""
    import ray.data as rd

    return rd.from_arrow(_sentinel_table(schema)).union(ds) \
        .repartition(num_blocks)


class hash_shuffle_context:
    """Temporarily flip ``DataContext.shuffle_strategy`` to
    HASH_SHUFFLE so ``repartition(keys=...)`` hash-co-locates group
    keys.  The context is SNAPSHOT into each dataset at creation, so
    datasets built inside the block keep hash shuffling however late
    they execute, and datasets built outside are untouched."""

    def __enter__(self):
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        self.ctx = DataContext.get_current()
        self.old = self.ctx.shuffle_strategy
        self.ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        return self

    def __exit__(self, *exc):
        self.ctx.shuffle_strategy = self.old
        return False


def drop_sentinels(ds, col: str):
    """Remove :func:`ensure_schema` sentinel rows by key column."""
    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        column = batch[col]
        if pa.types.is_unsigned_integer(column.type):
            mask = pc.not_equal(column, (1 << 64) - 1)
        elif pa.types.is_integer(column.type):
            mask = pc.not_equal(column, _SENTINEL_INT)
        elif pa.types.is_binary(column.type):
            mask = pc.not_equal(column, _SENTINEL_BYTES)
        else:
            mask = pc.not_equal(column, _SENTINEL_STR)
        return batch.filter(mask)

    return ds.map_batches(fix, batch_format="pyarrow")


# -- vectorized filter helpers ---------------------------------------------

def _keep_mask_isin(column, values: pa.Array) -> pa.Array:
    """Boolean mask: column element ∈ values (one vectorized kernel —
    a ``[v in keep for v in col.to_pylist()]`` loop is per-row Python)."""
    return pc.is_in(column, value_set=values)


def _pair_winner_mask(hashes: np.ndarray, keys: np.ndarray,
                      win_hashes: np.ndarray,
                      win_keys: np.ndarray) -> np.ndarray:
    """Row keeps iff (hash, key) equals its group's (hash, winner key).

    ``win_hashes`` must be sorted; lookup is one ``searchsorted`` + one
    vectorized equality (every hash has a winner by construction)."""
    idx = np.searchsorted(win_hashes, hashes)
    return win_keys[idx] == keys


def _sorted_winner_arrays(winners: pa.Table, hash_col: str,
                          key_col: str) -> tuple[np.ndarray, np.ndarray]:
    wh = winners[hash_col].to_numpy(zero_copy_only=False)
    wk = np.asarray(winners[key_col].to_pylist(), dtype=object)
    order = np.argsort(wh, kind="stable")
    return wh[order], wk[order]


# -- exact simhash dedup (the reference's semantics) -----------------------

def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash", pa.array(hashes, pa.uint64()))


def _dedup_exact_by_hash_col(hashed_ds, hash_col: str, keep_key: str,
                             reduce: str, num_partitions: int | None):
    """Shared winner-election + pair semi-join over an attached hash
    column.  Returns the filtered Dataset (hash column retained)."""
    import ray

    def batch_min(batch: pa.Table) -> pa.Table:
        return batch.select([hash_col, keep_key]) \
            .group_by(hash_col).aggregate([(keep_key, "min")])

    if reduce == "partitioned":
        from ray.data.aggregate import Min

        # distributed winner election + hash-shuffle semi-join on the
        # (hash, key) PAIR — no driver state at any point
        partials = hashed_ds.map_batches(batch_min, batch_format="pyarrow")
        winners = partials.groupby(hash_col).aggregate(
            Min(f"{keep_key}_min", alias_name="win_key"))
        win_schema = pa.schema([
            (hash_col, partials.schema().base_schema.field(hash_col).type),
            ("win_key",
             partials.schema().base_schema.field(f"{keep_key}_min").type),
        ])
        winners = ensure_schema(winners, win_schema)
        return hashed_ds.join(
            winners, "inner",
            num_partitions=num_partitions or default_join_partitions(),
            on=(hash_col, keep_key), right_on=(hash_col, "win_key"),
        )
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    refs = hashed_ds.map_batches(batch_min, batch_format="pyarrow") \
        .to_arrow_refs()
    partials = concat_partials(ray.get(refs))
    if partials.num_columns == 0 or partials.num_rows == 0:
        return hashed_ds  # empty input: nothing to elect or filter
    winners = partials.group_by(hash_col) \
        .aggregate([(f"{keep_key}_min", "min")])
    win_hashes, win_keys = _sorted_winner_arrays(
        winners, hash_col, f"{keep_key}_min_min")
    win_ref = ray.put((win_hashes, win_keys))

    def filter_winners(batch: pa.Table) -> pa.Table:
        wh, wk = ray.get(win_ref)
        hashes = batch[hash_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(batch[keep_key].to_pylist(), dtype=object)
        return batch.filter(pa.array(_pair_winner_mask(hashes, keys, wh, wk)))

    return hashed_ds.map_batches(filter_winners, batch_format="pyarrow")


def dedup_exact_simhash(ds, keep_key: str = "url", reduce: str = "driver",
                        num_partitions: int | None = None):
    """Exact-hash dedup with deterministic keep-min(keep_key) rule.

    See the module docstring for the two reduce tiers and the
    (hash, key) pair-filter semantics.  The internal simhash column is
    bit-cast to int64: hash values only GROUP (their order never
    matters) and Ray's shuffle block builders reject uint64 values
    above 2^63."""

    def attach(batch: pa.Table) -> pa.Table:
        hashes = np.fromiter(
            (simhash64(t) for t in batch["text"].to_pylist()),
            dtype=np.uint64, count=batch.num_rows,
        ).view(np.int64)
        return batch.append_column("simhash", pa.array(hashes, pa.int64()))

    hashed = ds.map_batches(attach, batch_format="pyarrow")
    out = _dedup_exact_by_hash_col(hashed, "simhash", keep_key,
                                   reduce, num_partitions)
    return out.drop_columns(["simhash"])


# -- exact dedup on content hash ------------------------------------------

def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [text_fingerprint(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def dedup_exact_hash(ds, keep_key: str, text_col: str = "text",
                     reduce: str = "driver",
                     num_partitions: int | None = None):
    """md5(text)-keyed exact dedup, same plan as
    :func:`dedup_exact_simhash` (output keeps the ``text_hash`` column)."""
    hashed = ds.map_batches(lambda b: add_text_hash(b, text_col),
                            batch_format="pyarrow")
    return _dedup_exact_by_hash_col(hashed, "text_hash", keep_key,
                                    reduce, num_partitions)


def dedup_incremental(new_ds, ref_ds, key_col: str = "text_hash",
                      reduce: str = "driver",
                      num_partitions: int | None = None,
                      key_type: pa.DataType = pa.string()):
    """Snapshot-over-snapshot dedup: keep only the rows of ``new_ds``
    whose content key does NOT appear in ``ref_ds`` (the
    already-curated corpus) — the incremental form of exact dedup a
    recurring crawl runs, where re-deduplicating the union from
    scratch would reshuffle the whole historical corpus every
    snapshot.  Both sides must carry ``key_col`` (md5 via
    :func:`add_text_hash`, simhash, or any content fingerprint).

    - ``reduce="driver"``: distinct reference keys pull to the driver
      and broadcast (``ray.put`` once, shared by every filter task) —
      for reference corpora whose KEY SET fits one machine.
    - ``reduce="partitioned"``: distinct keys stay a Dataset and the
      removal is a hash-shuffle ``left_anti`` join — zero driver
      state, the 10^12-row tier.  New-side rows cross the wire once;
      the reference side moves only its distinct-key column.
    """
    import ray
    import ray.data as rd  # noqa: F401 (kept for parity with siblings)

    ref_keys = ref_ds.select_columns([key_col])
    if reduce == "partitioned":
        from ray.data.aggregate import Count

        nparts = num_partitions or default_join_partitions()
        distinct = ref_keys.groupby(key_col, num_partitions=nparts) \
            .aggregate(Count(alias_name="_n")).drop_columns(["_n"])
        distinct = ensure_schema(
            distinct, pa.schema([(key_col, key_type)]),
            num_blocks=nparts)
        return new_ds.join(distinct, "left_anti",
                           num_partitions=nparts, on=(key_col,))
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    tabs = [t[key_col] for t in ray.get(ref_keys.to_arrow_refs())
            if t.num_columns]
    keys = (pa.concat_arrays([c.combine_chunks() for c in tabs]).unique()
            if tabs else pa.array([], key_type))
    keys_ref = ray.put(keys)

    def filter_new(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key_col], value_set=ray.get(keys_ref))
        return batch.filter(pc.invert(mask))

    return new_ds.map_batches(filter_new, batch_format="pyarrow")


# -- paragraph-level exact dedup -------------------------------------------

#: positions per document for the packed (key, pidx) winner rank.
#: 2^20 paragraphs/doc leaves 2^43 document keys before int64 overflow.
_PARA_SHIFT = 1 << 20


def dedup_paragraphs(ds, key_col: str = "doc_id", text_col: str = "text",
                     sep: str = "\n", reduce: str = "driver",
                     num_partitions: int | None = None):
    """Corpus-wide exact PARAGRAPH dedup — the Dolma/C4 curation
    primitive: split every document on ``sep``, keep only the FIRST
    occurrence of each distinct paragraph corpus-wide, and reassemble
    each document from its surviving paragraphs in original order.
    "First" = minimum (key, position) lexicographic, so the result is
    identical on any cluster size / block order.  Documents whose
    every paragraph already appeared elsewhere drop from the output
    (a curation pipeline drops now-empty docs).

    Output columns: (key_col, text_col, n_paras, n_kept) with
    ``text_col`` = surviving paragraphs joined by ``sep``.

    Plan: flat-map explode to one row per paragraph carrying
    ``md5(para)`` and the packed rank ``key * 2^20 + pidx``; winner
    election + (hash, rank) pair semi-join via the shared exact-dedup
    machinery (``reduce`` tiers as the module docstring); then ONE
    hash exchange co-locates each document's survivors and a
    vectorized per-block kernel stitches the text back together.
    Requires ``0 <= key < 2^43`` and < 2^20 paragraphs per document
    (asserted)."""
    import ray.data as rd

    def explode(batch: pa.Table) -> pa.Table:
        keys, pidxs, paras, hashes, ranks, totals = [], [], [], [], [], []
        for key, text in zip(batch[key_col].to_pylist(),
                             batch[text_col].to_pylist()):
            parts = text.split(sep) if text else []
            if not (0 <= key < (1 << 43)):
                raise ValueError(f"{key_col}={key} outside packed range")
            if len(parts) >= _PARA_SHIFT:
                raise ValueError(f"{key_col}={key}: {len(parts)} paragraphs "
                                 f"exceeds the 2^20 packing bound")
            for pidx, para in enumerate(parts):
                keys.append(key)
                pidxs.append(pidx)
                paras.append(para)
                hashes.append(text_fingerprint(para))
                ranks.append(key * _PARA_SHIFT + pidx)
                totals.append(len(parts))
        return pa.table({
            key_col: pa.array(keys, pa.int64()),
            "pidx": pa.array(pidxs, pa.int64()),
            "para": pa.array(paras, pa.string()),
            "para_hash": pa.array(hashes, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "n_paras": pa.array(totals, pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    survivors = _dedup_exact_by_hash_col(exploded, "para_hash", "rank",
                                         reduce, num_partitions)

    out_schema = pa.schema([
        (key_col, pa.int64()), (text_col, pa.string()),
        ("n_paras", pa.int64()), ("n_kept", pa.int64()),
    ])

    def reassemble(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        df = batch.select([key_col, "pidx", "para", "n_paras"]) \
            .to_pandas().sort_values([key_col, "pidx"], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        out = pd.DataFrame({
            key_col: g[key_col].first(),
            text_col: g["para"].agg(sep.join),
            "n_paras": g["n_paras"].first(),
            "n_kept": g["para"].size(),
        })
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)

    nparts = num_partitions or default_join_partitions()
    with hash_shuffle_context():
        shuffled = survivors.repartition(nparts, keys=[key_col], sort=False)
        return rd.from_arrow(out_schema.empty_table()).union(
            shuffled.map_batches(reassemble, batch_size=None,
                                 batch_format="pyarrow"))


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
            shingles = word_shingles(text, self.shingle_n)
            if not shingles:
                # sub-n-word doc: no bands -> never a dup candidate,
                # always kept (and every empty doc would otherwise
                # share the all-MAX_HASH signature and pair up)
                continue
            sig = self.hasher.signature(shingles)
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids_out.append(doc_id)
                keys_out.append(key)
        return pa.table({
            self.id_col: pa.array(ids_out, pa.int64()),
            "band_key": pa.array(keys_out, pa.string()),
        })


def minhash_duplicate_groups(ds, id_col: str = "doc_id", text_col: str = "text",
                             num_perm: int = 128, num_bands: int = 16,
                             concurrency: int | None = None,
                             reduce: str = "driver",
                             num_partitions: int | None = None,
                             max_iters: int = 10):
    """Dataset -> (doc_id, dup_root): dup_root = min id of the doc's
    CONNECTED COMPONENT in the doc-bucket bipartite graph (true
    single-link clusters — label propagation iterates to a fixpoint, so
    chains spanning several buckets collapse to one root; round 1
    stopped after one hop).

    Per iteration, two narrow passes over the materialized (id,
    band_key) table: bucket label = min over member docs' labels, then
    doc label = min over its buckets' labels.  Labels only decrease, so
    the global label sum is a monotone convergence witness; real
    corpora converge in 2-3 iterations (components are shallow).

    driver tier: per-batch Arrow group-min partials -> driver reduce ->
    broadcast (sorted ids, labels) arrays per pass.  partitioned tier:
    the same loop with distributed ``groupby`` + hash-shuffle ``join``
    carrying the labels as a Dataset — no driver state beyond the
    scalar convergence witness.  No per-group Python in either tier (a
    ``groupby(band_key).map_groups`` invokes pandas once per bucket and
    buckets are overwhelmingly singletons — measured 5.9s at 500 docs,
    all overhead).  Returns final (id, dup_root) rows."""
    import ray

    def bands_task(batch: pa.Table) -> pa.Table:
        fn = MinHashBands(id_col=id_col, text_col=text_col,
                          num_perm=num_perm, num_bands=num_bands)
        return fn(batch)

    kwargs = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    # materialize: the propagation loop scans the band table per
    # iteration — a lazy chain would re-shingle the corpus every pass
    bands = ds.map_batches(bands_task, **kwargs).materialize()

    if reduce == "partitioned":
        from ray.data.aggregate import Min

        nparts = num_partitions or default_join_partitions()
        labels = bands.map_batches(
            lambda b: pa.table({id_col: b[id_col], "label": b[id_col]}),
            batch_format="pyarrow",
        ).groupby(id_col).aggregate(Min("label", alias_name="label"))
        label_schema = pa.schema([(id_col, pa.int64()),
                                  ("label", pa.int64())])
        labels = ensure_schema(labels, label_schema)
        prev_sum = None
        for _ in range(max_iters):
            member = bands.join(labels, "inner", num_partitions=nparts,
                                on=(id_col,))
            bucket_min = ensure_schema(
                member.groupby("band_key").aggregate(
                    Min("label", alias_name="bucket_label")),
                pa.schema([("band_key", pa.string()),
                           ("bucket_label", pa.int64())]))
            cand = bands.join(bucket_min, "inner", num_partitions=nparts,
                              on=("band_key",))
            labels = ensure_schema(
                cand.groupby(id_col).aggregate(
                    Min("bucket_label", alias_name="label")),
                label_schema).materialize()
            label_sum = labels.sum("label")
            if label_sum == prev_sum:
                break
            prev_sum = label_sum
        return drop_sentinels(labels, id_col).map_batches(
            lambda b: b.rename_columns([id_col, "dup_root"]),
            batch_format="pyarrow")
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    def bucket_partials_fn(label_ref):
        def bucket_partials(batch: pa.Table) -> pa.Table:
            ids_sorted, lbl = ray.get(label_ref)
            pos = np.searchsorted(ids_sorted,
                                  batch[id_col].to_numpy(
                                      zero_copy_only=False))
            t = pa.table({
                "band_key": batch["band_key"],
                "label": pa.array(lbl[pos], pa.int64()),
            })
            return t.group_by("band_key").aggregate([("label", "min")])
        return bucket_partials

    def doc_partials_fn(bucket_ref):
        def doc_partials(batch: pa.Table) -> pa.Table:
            index, bmin = ray.get(bucket_ref)
            pos = index.get_indexer(batch["band_key"].to_pylist())
            t = pa.table({
                id_col: batch[id_col],
                "label": pa.array(bmin[pos], pa.int64()),
            })
            return t.group_by(id_col).aggregate([("label", "min")])
        return doc_partials

    # initial labels: label(id) = id over the distinct ids
    id_partials = concat_partials(ray.get(
        bands.map_batches(
            lambda b: b.select([id_col]).group_by(id_col).aggregate([]),
            batch_format="pyarrow").to_arrow_refs()))
    if id_partials.num_columns == 0 or id_partials.num_rows == 0:
        import ray.data as rd

        # no banded docs at all (empty or all-short input)
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "dup_root": pa.array([], pa.int64()),
        }))
    ids_sorted = np.unique(
        id_partials[id_col].to_numpy(zero_copy_only=False))
    labels = ids_sorted.copy()
    prev_sum = None
    for _ in range(max_iters):
        label_ref = ray.put((ids_sorted, labels))
        bparts = concat_partials(ray.get(
            bands.map_batches(bucket_partials_fn(label_ref),
                              batch_format="pyarrow").to_arrow_refs()))
        bwin = bparts.group_by("band_key").aggregate([("label_min", "min")])
        bucket_ref = ray.put((
            pd.Index(bwin["band_key"].to_pylist()),
            bwin["label_min_min"].to_numpy(zero_copy_only=False),
        ))
        dparts = concat_partials(ray.get(
            bands.map_batches(doc_partials_fn(bucket_ref),
                              batch_format="pyarrow").to_arrow_refs()))
        dwin = dparts.group_by(id_col).aggregate([("label_min", "min")])
        pos = np.searchsorted(
            ids_sorted, dwin[id_col].to_numpy(zero_copy_only=False))
        labels = labels.copy()
        labels[pos] = np.minimum(
            labels[pos],
            dwin["label_min_min"].to_numpy(zero_copy_only=False))
        label_sum = int(labels.sum())
        if label_sum == prev_sum:
            break
        prev_sum = label_sum

    import ray.data as rd

    return rd.from_arrow(pa.table({
        id_col: pa.array(ids_sorted, pa.int64()),
        "dup_root": pa.array(labels, pa.int64()),
    }))


def dedup_minhash(ds, id_col: str = "doc_id", text_col: str = "text",
                  reduce: str = "driver",
                  num_partitions: int | None = None, **kwargs):
    """Keep one representative (min id) per single-link near-dup
    cluster — label propagation iterates to a fixpoint, so multi-hop
    chains (A~B in one bucket, B~C in another) collapse to one
    representative (see :func:`minhash_duplicate_groups`)."""
    import ray

    roots = minhash_duplicate_groups(ds, id_col=id_col, text_col=text_col,
                                     reduce=reduce,
                                     num_partitions=num_partitions, **kwargs)
    # DROP-set semantics: roots only covers docs that emitted band rows
    # (sub-shingle-length docs don't, see MinHashBands) — filtering to a
    # keep set would silently drop every unbanded doc, so filter OUT the
    # losers (id != component root) instead; everything else survives.
    drop = roots.map_batches(
        lambda b: b.filter(pc.not_equal(b[id_col], b["dup_root"]))
        .select([id_col]),
        batch_format="pyarrow",
    )
    if reduce == "partitioned":
        drop = ensure_schema(
            drop, pa.schema([(id_col, pa.int64())]),
            num_blocks=num_partitions or default_join_partitions())
        return ds.join(drop, "left_anti",
                       num_partitions=num_partitions
                       or default_join_partitions(),
                       on=(id_col,))

    drop_tabs = [t[id_col] for t in ray.get(drop.to_arrow_refs())
                 if t.num_columns]
    drop_ids = (pa.concat_arrays([c.combine_chunks() for c in drop_tabs])
                if drop_tabs else pa.array([], pa.int64()))
    drop_ref = ray.put(drop_ids)

    def filter_keep(batch: pa.Table) -> pa.Table:
        mask = _keep_mask_isin(batch[id_col], ray.get(drop_ref))
        return batch.filter(pc.invert(mask))

    return ds.map_batches(filter_keep, batch_format="pyarrow")


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


def simhash_near_root_ds(ds, id_col: str = "doc_id",
                         text_col: str = "text", radius: int = 3,
                         num_bands: int = 4):
    """Lazy Dataset of (id, dup_root); dup_root = min id of the doc's
    hamming-<=radius hash component.

    Map stage hashes; the driver reduces over DISTINCT hash values only
    (banding + verified union-find — tiny after the map-side Arrow
    group-min collapses exact-dup masses to one row per hash); the
    per-doc root attach runs distributed via a broadcast sorted
    hash->root array.  Scale path: the distinct-hash reduce becomes a
    hash-partitioned groupby and components propagate iteratively; map
    kernels are unchanged."""
    import ray

    rows_ds = _simhash_id_rows(ds, id_col, text_col)

    def batch_min(batch: pa.Table) -> pa.Table:
        return batch.group_by("simhash").aggregate([(id_col, "min")])

    partials = concat_partials(
        ray.get(rows_ds.map_batches(batch_min,
                                    batch_format="pyarrow").to_arrow_refs()))
    if partials.num_columns == 0 or partials.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "dup_root": pa.array([], pa.int64()),
        }))
    rep = partials.group_by("simhash") \
        .aggregate([(f"{id_col}_min", "min")])
    rep_hashes = rep["simhash"].to_pylist()
    rep_min = rep[f"{id_col}_min_min"].to_pylist()
    comp = _hash_components([int(v) for v in rep_hashes], radius, num_bands)
    cluster_min: dict[int, int] = {}
    for v, mid in zip(rep_hashes, rep_min):
        r = comp[int(v)]
        cluster_min[r] = min(cluster_min.get(r, int(mid)), int(mid))
    # hash -> component-min root, vectorized per-doc attach
    root_hashes = np.array([int(v) for v in rep_hashes], dtype=np.uint64)
    order = np.argsort(root_hashes, kind="stable")
    root_hashes = root_hashes[order]
    root_vals = np.array(
        [cluster_min[comp[int(v)]] for v in rep_hashes], dtype=np.int64
    )[order]
    root_ref = ray.put((root_hashes, root_vals))

    def attach_root(batch: pa.Table) -> pa.Table:
        rh, rv = ray.get(root_ref)
        idx = np.searchsorted(rh, batch["simhash"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            id_col: batch[id_col],
            "dup_root": pa.array(rv[idx], pa.int64()),
        })

    return rows_ds.map_batches(attach_root, batch_format="pyarrow")


def _popcount64(values: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return np.unpackbits(values.view(np.uint8)).reshape(len(values), 8 * 8) \
        .sum(axis=1)


def simhash_near_root_ds_partitioned(ds, id_col: str = "doc_id",
                                     text_col: str = "text",
                                     radius: int = 3, num_bands: int = 4,
                                     num_partitions: int | None = None,
                                     max_iters: int = 10):
    """Distributed tier of :func:`simhash_near_root_ds`: connected
    components over DISTINCT hash values without any driver state.

    Plan: distinct (simhash, min doc id) via groupby -> band explode ->
    band self-join proposes value pairs -> vectorized hamming
    verification keeps real edges -> min-label propagation over the
    edge list (labels carried as a Dataset; the monotone label sum is
    the convergence witness) -> per-doc root attach by joining the
    hash rows.  Hashes are bit-cast to int64 for the shuffles; hamming
    runs on the uint64 view."""
    import ray.data as rd
    from ray.data.aggregate import Min

    nparts = num_partitions or default_join_partitions()

    def hash_rows(batch: pa.Table) -> pa.Table:
        hashes = np.fromiter(
            (simhash64(t) for t in batch[text_col].to_pylist()),
            dtype=np.uint64, count=batch.num_rows).view(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "simhash": pa.array(hashes, pa.int64()),
        })

    rows = ds.map_batches(hash_rows, batch_format="pyarrow").materialize()
    rep_schema = pa.schema([("simhash", pa.int64()), ("label", pa.int64())])
    reps = rows.map_batches(
        lambda b: pa.table({"simhash": b["simhash"], "label": b[id_col]}),
        batch_format="pyarrow",
    ).groupby("simhash").aggregate(Min("label", alias_name="label"))
    labels = ensure_schema(reps, rep_schema).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        hv = batch["simhash"].to_numpy(zero_copy_only=False)
        width = 64 // num_bands
        mask = np.uint64((1 << width) - 1)
        out_h, out_k = [], []
        uv = hv.view(np.uint64)
        for b in range(num_bands):
            band = (uv >> np.uint64(b * width)) & mask
            out_h.append(hv)
            out_k.append(np.int64(b) << np.int64(48) | band.view(np.int64))
        return pa.table({
            "simhash": pa.array(np.concatenate(out_h), pa.int64()),
            "band_id": pa.array(np.concatenate(out_k), pa.int64()),
        })

    bands = drop_sentinels(labels, "simhash").map_batches(
        lambda b: band_rows(b.select(["simhash"])),
        batch_format="pyarrow")
    right = bands.map_batches(
        lambda b: b.rename_columns(["simhash_b", "band_id"]),
        batch_format="pyarrow")
    cand = bands.join(right, "inner", num_partitions=nparts,
                      on=("band_id",))

    def verify_edges(batch: pa.Table) -> pa.Table:
        a = batch["simhash"].to_numpy(zero_copy_only=False)
        b = batch["simhash_b"].to_numpy(zero_copy_only=False)
        keep = (a != b) & (_popcount64(a ^ b) <= radius)
        return pa.table({
            "src": pa.array(a[keep], pa.int64()),
            "dst": pa.array(b[keep], pa.int64()),
        })

    # both directions come out of the symmetric self-join naturally;
    # dedup repeated edges (values sharing several bands)
    from ray.data.aggregate import Count

    edges = cand.map_batches(verify_edges, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="n")) \
        .drop_columns(["n"])
    edges = ensure_schema(edges, pa.schema([("src", pa.int64()),
                                            ("dst", pa.int64())])) \
        .materialize()

    prev_sum = None
    for _ in range(max_iters):
        neighbor = edges.join(
            labels.map_batches(
                lambda b: b.rename_columns(["src", "src_label"]),
                batch_format="pyarrow"),
            "inner", num_partitions=nparts, on=("src",))
        incoming = neighbor.map_batches(
            lambda b: pa.table({"simhash": b["dst"],
                                "label": b["src_label"]}),
            batch_format="pyarrow")
        labels = ensure_schema(
            labels.union(incoming).groupby("simhash")
            .aggregate(Min("label", alias_name="label")),
            rep_schema).materialize()
        label_sum = labels.sum("label")
        if label_sum == prev_sum:
            break
        prev_sum = label_sum

    rooted = rows.join(
        drop_sentinels(labels, "simhash").map_batches(
            lambda b: b.rename_columns(["simhash", "dup_root"]),
            batch_format="pyarrow"),
        "inner", num_partitions=nparts, on=("simhash",))
    return rooted.map_batches(
        lambda b: b.select([id_col, "dup_root"]), batch_format="pyarrow")


def simhash_near_duplicate_pairs(ds, id_col: str = "doc_id",
                                 text_col: str = "text", radius: int = 3,
                                 num_bands: int = 4) -> pd.DataFrame:
    """DataFrame form of :func:`simhash_near_root_ds` (diagnostics)."""
    return simhash_near_root_ds(ds, id_col=id_col, text_col=text_col,
                                radius=radius,
                                num_bands=num_bands).to_pandas()


def dedup_simhash_near(ds, id_col: str = "doc_id", text_col: str = "text",
                       radius: int = 3, num_bands: int = 4,
                       reduce: str = "driver",
                       num_partitions: int | None = None):
    """Keep one representative (min id) per simhash-hamming-radius
    cluster — same contract as :func:`dedup_minhash`.  Driver tier:
    union-find over distinct hashes, only the keep ids reach the
    driver.  Partitioned tier: distributed edge-verified label
    propagation (:func:`simhash_near_root_ds_partitioned`) + join
    semi-filter, zero driver state."""
    import ray

    if reduce == "partitioned":
        roots = simhash_near_root_ds_partitioned(
            ds, id_col=id_col, text_col=text_col, radius=radius,
            num_bands=num_bands, num_partitions=num_partitions)
        keep = roots.map_batches(
            lambda b: b.filter(pc.equal(b[id_col], b["dup_root"]))
            .select([id_col]),
            batch_format="pyarrow",
        )
        return ds.join(keep, "inner",
                       num_partitions=num_partitions
                       or default_join_partitions(),
                       on=(id_col,))
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    roots = simhash_near_root_ds(ds, id_col=id_col, text_col=text_col,
                                 radius=radius, num_bands=num_bands)
    keep_df = roots.map_batches(
        lambda b: b.filter(pc.equal(b[id_col], b["dup_root"]))
        .select([id_col]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(keep_df) == 0:
        return ds  # empty input: nothing hashed, nothing to drop
    keep_ref = ray.put(pa.array(keep_df[id_col].to_numpy(), pa.int64()))

    def filter_keep(batch: pa.Table) -> pa.Table:
        return batch.filter(_keep_mask_isin(batch[id_col], ray.get(keep_ref)))

    return ds.map_batches(filter_keep, batch_format="pyarrow")


# -- shared candidate-pair enumeration -------------------------------------

def _pruned_bucket_pull(rows_ds, id_col: str, bucket_col: str) -> pa.Table:
    """Driver-tier pull of (id, bucket) rows with SINGLETON buckets
    pruned before anything wide reaches the driver (VERDICT r2 #5).

    LSH buckets are overwhelmingly singletons by construction, so a
    raw ``to_arrow_refs`` pull ships ~10x more rows than carry any
    collision.  Two passes over the (materialized) rows instead:

    1. per-batch ``(bucket, n)`` Arrow count partials -> one driver
       group-sum over the NARROW bucket column (no ids) -> the
       multi-occupancy bucket set;
    2. broadcast that set, filter the rows distributed-side, pull only
       the surviving collision rows.

    Driver peak is the (bucket, count) table from pass 1 plus the
    ~10x-smaller collision rows — never the raw (id, bucket) table.
    Above ~10^8 band rows flip the caller to ``reduce="partitioned"``,
    where pair enumeration is a bucket self-join and nothing is pulled
    at all."""
    import ray

    rows_ds = rows_ds.materialize()

    def counts(batch: pa.Table) -> pa.Table:
        return batch.select([bucket_col]).group_by(bucket_col) \
            .aggregate([(bucket_col, "count")])

    ctab = concat_partials(ray.get(
        rows_ds.map_batches(counts, batch_format="pyarrow")
        .to_arrow_refs()))
    if ctab.num_columns == 0 or ctab.num_rows == 0:
        return pa.table({})
    totals = ctab.group_by(bucket_col) \
        .aggregate([(f"{bucket_col}_count", "sum")])
    multi = totals.filter(
        pc.greater_equal(totals[f"{bucket_col}_count_sum"], 2))[bucket_col] \
        .combine_chunks()
    if len(multi) == 0:
        return pa.table({})
    multi_ref = ray.put(multi)

    def keep_multi(batch: pa.Table) -> pa.Table:
        return batch.filter(
            _keep_mask_isin(batch[bucket_col], ray.get(multi_ref)))

    return concat_partials(ray.get(
        rows_ds.map_batches(keep_multi, batch_format="pyarrow")
        .to_arrow_refs()))


def _collision_pairs(ids: np.ndarray, buckets: np.ndarray) -> set[tuple]:
    """Unique (id_a < id_b) pairs of ids sharing a bucket — vectorized
    group detection (lexsort + boundary diff); the quadratic expansion
    runs only inside collision buckets (rare by construction)."""
    if len(ids) == 0:
        return set()
    order = np.lexsort((ids, buckets))
    b_sorted, i_sorted = buckets[order], ids[order]
    # drop duplicate (bucket, id) rows
    first = np.ones(len(b_sorted), dtype=bool)
    first[1:] = (b_sorted[1:] != b_sorted[:-1]) | (i_sorted[1:] != i_sorted[:-1])
    b_sorted, i_sorted = b_sorted[first], i_sorted[first]
    boundaries = np.flatnonzero(
        np.concatenate(([True], b_sorted[1:] != b_sorted[:-1], [True])))
    pairs: set[tuple] = set()
    for s, e in zip(boundaries[:-1], boundaries[1:]):
        if e - s < 2:
            continue
        members = i_sorted[s:e]
        ii, jj = np.triu_indices(len(members), k=1)
        pairs.update(zip(members[ii].tolist(), members[jj].tolist()))
    return pairs


# -- n-gram Jaccard verification of LSH candidates --------------------------

def jaccard_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            threshold: float = 0.8, shingle_n: int = 3,
                            num_perm: int = 128, num_bands: int = 16,
                            concurrency: int = 2, reduce: str = "driver",
                            num_partitions: int | None = None):
    """LSH candidate pairs verified by TRUE n-gram Jaccard >= threshold.

    Two phases: (1) MinHash banding proposes candidate pairs (the only
    all-pairs-free way at scale); (2) each candidate pair's exact
    shingle Jaccard is computed over the pair's texts — and only those.
    Returns (id_a, id_b, jaccard) with id_a < id_b — a sorted DataFrame
    in ``reduce="driver"`` mode (narrow band rows pulled, pairs
    enumerated vectorized, candidate texts broadcast), a lazy Dataset
    in ``reduce="partitioned"`` mode (band-key self-join + two-key
    distinct + per-side text joins; nothing on the driver)."""
    import ray

    def bands_task(batch: pa.Table) -> pa.Table:
        fn = MinHashBands(id_col=id_col, text_col=text_col,
                          num_perm=num_perm, num_bands=num_bands,
                          shingle_n=shingle_n)
        return fn(batch)

    bands = ds.map_batches(bands_task, batch_format="pyarrow")
    if reduce == "partitioned":
        return _jaccard_pairs_partitioned(
            ds, bands, id_col, text_col, threshold, shingle_n,
            num_partitions or default_join_partitions())
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    # driver reduce over collision buckets only; a Dataset groupby
    # would invoke Python per bucket and buckets are overwhelmingly
    # singletons — which is also why the pull prunes them first
    btab = _pruned_bucket_pull(bands, id_col, "band_key")
    cand = set() if btab.num_columns == 0 else _collision_pairs(
        btab[id_col].to_numpy(zero_copy_only=False),
        np.asarray(btab["band_key"].to_pylist(), dtype=object),
    )
    empty = pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                          "id_b": pd.array([], dtype="int64"),
                          "jaccard": pd.array([], dtype="float64")})
    if not cand:
        return empty

    cand_ids = pa.array(sorted({i for pair in cand for i in pair}), pa.int64())
    cand_ref = ray.put(cand_ids)

    def project_candidates(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, text_col]).filter(
            _keep_mask_isin(batch[id_col], ray.get(cand_ref)))

    texts_df = ds.map_batches(project_candidates,
                              batch_format="pyarrow").to_pandas()
    shingle_map = {
        i: word_shingles(t, shingle_n)
        for i, t in zip(texts_df[id_col], texts_df[text_col])
    }
    from ..functions.minhash import jaccard as exact_jaccard

    pairs_sorted = sorted(cand)
    scores = np.round(
        [exact_jaccard(shingle_map[a], shingle_map[b])
         for a, b in pairs_sorted], 6)
    out = pd.DataFrame({
        "id_a": pd.array([a for a, _ in pairs_sorted], dtype="int64"),
        "id_b": pd.array([b for _, b in pairs_sorted], dtype="int64"),
        "jaccard": scores,
    })
    out = out[out["jaccard"] >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _jaccard_pairs_partitioned(ds, bands, id_col: str, text_col: str,
                               threshold: float, shingle_n: int,
                               num_partitions: int):
    """Distributed candidate enumeration + exact-Jaccard verification
    (see :func:`jaccard_candidate_pairs`)."""
    from ray.data.aggregate import Count

    right = bands.map_batches(
        lambda b: b.rename_columns(["id_b", "band_key"]),
        batch_format="pyarrow")
    self_joined = bands.join(right, "inner", num_partitions=num_partitions,
                             on=("band_key",))

    def ordered_pairs(batch: pa.Table) -> pa.Table:
        a = batch[id_col].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
        })

    pairs = self_joined.map_batches(ordered_pairs, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands")) \
        .drop_columns(["n_bands"])
    pairs = ensure_schema(pairs, pa.schema([("id_a", pa.int64()),
                                            ("id_b", pa.int64())]))

    texts = ds.map_batches(
        lambda b: b.select([id_col, text_col]),
        batch_format="pyarrow")
    texts_a = texts.map_batches(
        lambda b: b.rename_columns(["id_a", "text_a"]),
        batch_format="pyarrow")
    texts_b = texts.map_batches(
        lambda b: b.rename_columns(["id_b", "text_b"]),
        batch_format="pyarrow")
    joined = pairs.join(texts_a, "inner", num_partitions=num_partitions,
                        on=("id_a",))
    # chained joins need the guard between hops too: a zero-match first
    # join leaves the second join's left side block-less (see
    # ensure_schema); the sentinel's id_b never matches a real text
    joined = ensure_schema(joined, pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("text_a", pa.string())]))
    joined = joined.join(texts_b, "inner", num_partitions=num_partitions,
                         on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        from ..functions.minhash import jaccard as exact_jaccard

        # per-batch shingle cache: a hub doc appearing in many pairs
        # shingles once per batch, not once per pair
        cache: dict = {}

        def sh(key, text):
            s = cache.get(key)
            if s is None:
                s = cache[key] = word_shingles(text, shingle_n)
            return s

        a_ids = batch["id_a"].to_pylist()
        b_ids = batch["id_b"].to_pylist()
        scores = np.round([
            exact_jaccard(sh(a, ta), sh(b, tb))
            for a, b, ta, tb in zip(a_ids, b_ids,
                                    batch["text_a"].to_pylist(),
                                    batch["text_b"].to_pylist())
        ], 6)
        keep = scores >= threshold
        return pa.table({
            "id_a": pa.array(np.asarray(a_ids, dtype=np.int64)[keep]),
            "id_b": pa.array(np.asarray(b_ids, dtype=np.int64)[keep]),
            "jaccard": pa.array(scores[keep], pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# -- embedding-cosine near-dup ---------------------------------------------

def embedding_lsh_candidate_pairs(ds, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  threshold: float = 0.95,
                                  num_tables: int = 16,
                                  hyperplanes_per_table: int = 12,
                                  seed: int = 42,
                                  reduce: str = "driver",
                                  num_partitions: int | None = None):
    """Random-hyperplane LSH (Charikar 2002 SimHash for angles): the
    bucketed SCALE path for cosine near-dup — no all-pairs matrix.

    Each of ``num_tables`` hash tables buckets vectors by the sign
    pattern of ``hyperplanes_per_table`` random projections; two
    vectors at angle θ collide in one table with prob
    (1 - θ/π)^h, so a >= 0.95-cosine pair survives the default 16x12
    with prob ~0.995.  Candidates are verified with the exact cosine.
    Returns verified (id_a, id_b, cos_sim) pairs, id_a < id_b — a
    DataFrame in ``reduce="driver"`` mode, a lazy Dataset in
    ``reduce="partitioned"`` mode.

    Reduce tiers: ``"driver"`` pulls the narrow (id, bucket) rows and
    enumerates collision pairs vectorized on the driver (fine while
    docs x tables rows fit one machine); ``"partitioned"`` enumerates
    pairs as a hash-shuffle SELF-JOIN on the bucket key, dedups with a
    distributed two-key groupby, and verifies by joining packed vector
    blobs back per side — nothing touches the driver (both tiers are
    bit-identical under test).

    For LOW thresholds (broad similarity mining, e.g. 0.45) pass fewer
    hyperplanes per table and more tables — collision probability at
    wide angles decays as 0.65^h, so deep codes would miss everything."""
    import ray

    rng = np.random.RandomState(seed)
    sample_df = ds.limit(1).to_pandas()
    if len(sample_df) == 0:
        # empty input: nothing to bucket (and no dim to probe)
        empty_tab = pa.table({"id_a": pa.array([], pa.int64()),
                              "id_b": pa.array([], pa.int64()),
                              "cos_sim": pa.array([], pa.float64())})
        if reduce == "partitioned":
            import ray.data as rd

            return rd.from_arrow(empty_tab)
        if reduce != "driver":
            raise ValueError(f"unknown reduce mode: {reduce!r}")
        return empty_tab.to_pandas()
    dim = len(sample_df[vec_col].iloc[0])
    planes = rng.randn(num_tables, hyperplanes_per_table, dim)
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(hyperplanes_per_table)).astype(np.int64)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = batch[id_col].to_numpy()
        mat = list_matrix(batch[vec_col], len(ids))
        out_ids, out_keys = [], []
        for t in range(pl.shape[0]):
            signs = (mat @ pl[t].T) > 0                # n x h
            codes = signs.astype(np.int64) @ weights
            out_ids.append(ids)
            out_keys.append((np.int64(t) << np.int64(32)) + codes)
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids), pa.int64()),
            "bucket": pa.array(np.concatenate(out_keys), pa.int64()),
        })

    buckets = ds.map_batches(bucket_rows, batch_format="pyarrow")
    if reduce == "partitioned":
        return _lsh_pairs_partitioned(ds, buckets, id_col, vec_col,
                                      threshold, dim,
                                      num_partitions or
                                      default_join_partitions())
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")
    btab = _pruned_bucket_pull(buckets, id_col, "bucket")
    cand = set() if btab.num_columns == 0 else _collision_pairs(
        btab[id_col].to_numpy(zero_copy_only=False),
        btab["bucket"].to_numpy(zero_copy_only=False),
    )
    empty = pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                          "id_b": pd.array([], dtype="int64"),
                          "cos_sim": pd.array([], dtype="float64")})
    if not cand:
        return empty

    # exact verification: fetch only candidate vectors
    wanted = pa.array(sorted({i for pair in cand for i in pair}), pa.int64())
    wanted_ref = ray.put(wanted)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, vec_col]).filter(
            _keep_mask_isin(batch[id_col], ray.get(wanted_ref)))

    vdf = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    cand_ids_np = vdf[id_col].to_numpy()
    order = np.argsort(cand_ids_np, kind="stable")
    cand_ids_np = cand_ids_np[order]
    mat = np.stack(vdf[vec_col].to_numpy()[order]).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    pairs_sorted = sorted(cand)
    a_ids = np.fromiter((a for a, _ in pairs_sorted), dtype=np.int64,
                        count=len(pairs_sorted))
    b_ids = np.fromiter((b for _, b in pairs_sorted), dtype=np.int64,
                        count=len(pairs_sorted))
    ai = np.searchsorted(cand_ids_np, a_ids)
    bi = np.searchsorted(cand_ids_np, b_ids)
    sims = np.einsum("ij,ij->i", mat[ai], mat[bi]) / (norms[ai] * norms[bi])
    keep = sims >= threshold
    if not keep.any():
        return empty
    return pd.DataFrame({
        "id_a": pd.array(a_ids[keep], dtype="int64"),
        "id_b": pd.array(b_ids[keep], dtype="int64"),
        "cos_sim": np.round(sims[keep], 6),
    })


def _lsh_pairs_partitioned(ds, buckets, id_col: str, vec_col: str,
                           threshold: float, dim: int,
                           num_partitions: int):
    """Distributed candidate enumeration + verification (see
    :func:`embedding_lsh_candidate_pairs`).  Vectors travel as packed
    float64 blobs because Acero joins reject list<> non-key columns."""
    right = buckets.map_batches(
        lambda b: b.rename_columns(["id_b", "bucket"]),
        batch_format="pyarrow")
    self_joined = buckets.join(right, "inner",
                               num_partitions=num_partitions,
                               on=("bucket",))

    def ordered_pairs(batch: pa.Table) -> pa.Table:
        a = batch[id_col].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
        })

    from ray.data.aggregate import Count

    pairs = self_joined.map_batches(ordered_pairs, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_tables")) \
        .drop_columns(["n_tables"])
    pairs = ensure_schema(pairs, pa.schema([("id_a", pa.int64()),
                                            ("id_b", pa.int64())]))

    def pack_vectors(batch: pa.Table) -> pa.Table:
        mat = list_matrix(batch[vec_col], batch.num_rows)
        norms = np.linalg.norm(mat, axis=1)
        blobs = [mat[i].tobytes() for i in range(mat.shape[0])]
        return pa.table({
            id_col: batch[id_col],
            "blob": pa.array(blobs, pa.binary()),
            "vnorm": pa.array(norms, pa.float64()),
        })

    vecs = ds.map_batches(pack_vectors, batch_format="pyarrow")
    vecs_a = vecs.map_batches(
        lambda b: b.rename_columns(["id_a", "blob_a", "norm_a"]),
        batch_format="pyarrow")
    vecs_b = vecs.map_batches(
        lambda b: b.rename_columns(["id_b", "blob_b", "norm_b"]),
        batch_format="pyarrow")
    joined = pairs.join(vecs_a, "inner", num_partitions=num_partitions,
                        on=("id_a",))
    # guard between the chained joins (see _jaccard_pairs_partitioned)
    joined = ensure_schema(joined, pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("blob_a", pa.binary()), ("norm_a", pa.float64())]))
    joined = joined.join(vecs_b, "inner", num_partitions=num_partitions,
                         on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        mat_a = np.frombuffer(
            b"".join(batch["blob_a"].to_pylist())).reshape(n, dim)
        mat_b = np.frombuffer(
            b"".join(batch["blob_b"].to_pylist())).reshape(n, dim)
        sims = np.einsum("ij,ij->i", mat_a, mat_b) / (
            batch["norm_a"].to_numpy(zero_copy_only=False)
            * batch["norm_b"].to_numpy(zero_copy_only=False))
        keep = sims >= threshold
        return pa.table({
            "id_a": batch["id_a"].filter(pa.array(keep)),
            "id_b": batch["id_b"].filter(pa.array(keep)),
            "cos_sim": pa.array(np.round(sims[keep], 6), pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


def dedup_embedding_cosine(ds, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95,
                           method: str = "lsh",
                           num_tables: int = 16,
                           hyperplanes_per_table: int = 12,
                           reduce: str = "driver",
                           num_partitions: int | None = None):
    """Keep rows with no LOWER-id row within cosine >= threshold.

    The dominance rule makes the result order-free and SQL-checkable
    (NOT EXISTS over the cross join).  Default ``method="lsh"`` runs
    hyperplane-LSH candidate generation + exact verification
    (:func:`embedding_lsh_candidate_pairs`) and drops every id that
    appears as the HIGHER id of a verified pair — no all-pairs matrix,
    no full-table driver materialization of the vectors.

    LSH recall is PROBABILISTIC, not exact: a >= ``threshold``-cosine
    pair survives the default 16x12 banding with prob ~0.995 per pair
    (1-(1-(1-θ/π)^h)^T), so at scale a small fraction of rows with a
    lower-id near-duplicate slip through and the result can strictly
    contain the exact answer.  ``method="matrix"`` is the O(n²)
    broadcast-matmul oracle — exact by construction, conformance
    checks only, never the scale path; raise ``num_tables`` /
    lower ``hyperplanes_per_table`` to push LSH recall toward 1.

    Reduce tiers (VERDICT r2 #1): ``reduce="driver"`` pulls only the
    verified pairs' high ids to the driver and broadcast-filters;
    ``reduce="partitioned"`` derives the dominated-id set as a Dataset
    (distinct ``id_b`` groupby over the pair Dataset) and removes it
    with a hash-shuffle ``left_anti`` join — zero driver state, for
    when even the dominated-id set outgrows one machine."""
    import ray

    if method == "lsh" and reduce == "partitioned":
        from ray.data.aggregate import Count

        nparts = num_partitions or default_join_partitions()
        pairs = embedding_lsh_candidate_pairs(
            ds, id_col=id_col, vec_col=vec_col, threshold=threshold,
            num_tables=num_tables,
            hyperplanes_per_table=hyperplanes_per_table,
            reduce="partitioned", num_partitions=nparts)
        dominated = pairs.map_batches(
            lambda b: pa.table({id_col: b["id_b"]}),
            batch_format="pyarrow",
        ).groupby(id_col).aggregate(Count(alias_name="n_pairs")) \
            .drop_columns(["n_pairs"])
        dominated = ensure_schema(
            dominated, pa.schema([(id_col, pa.int64())]),
            num_blocks=nparts)

        # Acero rejects list<> non-key columns in ANY join type, so the
        # vector column travels through the anti-join as a packed
        # float64 blob and is unpacked (original value type restored)
        # on the way out.
        probe = next(iter(ds.limit(1).iter_batches(
            batch_size=1, batch_format="pyarrow")))
        value_type = probe[vec_col].type.value_type

        def pack(batch: pa.Table) -> pa.Table:
            mat = list_matrix(batch[vec_col], batch.num_rows)
            blobs = pa.array(
                [mat[r].tobytes() for r in range(batch.num_rows)],
                pa.binary())
            i = batch.schema.get_field_index(vec_col)
            return batch.set_column(i, "__vec_blob", blobs)

        def unpack(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            blobs = batch["__vec_blob"].to_pylist()
            flat = (np.frombuffer(b"".join(blobs))
                    if blobs else np.array([], dtype=np.float64))
            dim = len(flat) // n if n else 0
            lists = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * dim,
                         pa.int32()),
                pa.array(flat, pa.float64()).cast(value_type))
            i = batch.schema.get_field_index("__vec_blob")
            return batch.set_column(i, vec_col, lists)

        kept = ds.map_batches(pack, batch_format="pyarrow") \
            .join(dominated, "left_anti", num_partitions=nparts,
                  on=(id_col,))
        return kept.map_batches(unpack, batch_format="pyarrow")
    if reduce != "driver":
        raise ValueError(
            f"unknown reduce mode for method={method!r}: {reduce!r}")
    if method == "lsh":
        pairs = embedding_lsh_candidate_pairs(
            ds, id_col=id_col, vec_col=vec_col, threshold=threshold,
            num_tables=num_tables,
            hyperplanes_per_table=hyperplanes_per_table)
        dominated = pa.array(sorted(set(pairs["id_b"].tolist())), pa.int64())
        dom_ref = ray.put(dominated)

        def drop_dominated(batch: pa.Table) -> pa.Table:
            mask = _keep_mask_isin(batch[id_col], ray.get(dom_ref))
            return batch.filter(pc.invert(mask))

        return ds.map_batches(drop_dominated, batch_format="pyarrow")
    if method != "matrix":
        raise ValueError(f"unknown method: {method!r}")

    ref_df = ds.select_columns([id_col, vec_col]).to_pandas()
    if len(ref_df) == 0:
        return ds
    ref_df = ref_df.sort_values(id_col, ignore_index=True)
    ids = ref_df[id_col].to_numpy()
    mat = np.stack(ref_df[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    broadcast = ray.put((ids, mat))

    def keep_mask(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(broadcast)
        bids = batch[id_col].to_numpy()
        bmat = list_matrix(batch[vec_col], len(bids))
        bmat = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
        sims = bmat @ all_mat.T
        dominated = ((sims >= threshold) & (all_ids[None, :] < bids[:, None])
                     ).any(axis=1)
        return batch.filter(pa.array(~dominated, pa.bool_()))

    return ds.map_batches(keep_mask, batch_format="pyarrow")


# -- incremental NEAR-dedup vs a curated snapshot ---------------------------

def _cross_collision_pairs(ids: np.ndarray, buckets: np.ndarray,
                           sides: np.ndarray) -> set[tuple]:
    """Unique (new_id, ref_id) pairs sharing a bucket across sides
    (side 0 = new, side 1 = reference) — the cross-side form of
    :func:`_collision_pairs`; expansion runs only inside buckets that
    contain BOTH sides."""
    if len(ids) == 0:
        return set()
    order = np.lexsort((ids, sides, buckets))
    b_s, s_s, i_s = buckets[order], sides[order], ids[order]
    first = np.ones(len(b_s), dtype=bool)
    first[1:] = (b_s[1:] != b_s[:-1]) | (s_s[1:] != s_s[:-1]) \
        | (i_s[1:] != i_s[:-1])
    b_s, s_s, i_s = b_s[first], s_s[first], i_s[first]
    bounds = np.flatnonzero(
        np.concatenate(([True], b_s[1:] != b_s[:-1], [True])))
    pairs: set[tuple] = set()
    for s, e in zip(bounds[:-1], bounds[1:]):
        side_b, ids_b = s_s[s:e], i_s[s:e]
        new_ids = ids_b[side_b == 0]
        ref_ids = ids_b[side_b == 1]
        if len(new_ids) and len(ref_ids):
            pairs.update(
                (int(n), int(r)) for n in new_ids for r in ref_ids)
    return pairs


def near_dedup_incremental(new_ds, ref_ds, id_col: str = "doc_id",
                           text_col: str = "text",
                           threshold: float = 0.8, shingle_n: int = 3,
                           num_perm: int = 128, num_bands: int = 16,
                           reduce: str = "driver",
                           num_partitions: int | None = None):
    """Incremental NEAR-dedup: keep only the rows of ``new_ds`` with
    NO near-duplicate (n-gram Jaccard >= threshold) in ``ref_ds``, the
    already-curated corpus — the recurring-crawl form of
    :func:`jaccard_candidate_pairs`, where re-mining the union from
    scratch would re-shuffle the whole historical corpus every
    snapshot.  Both sides band with the SAME MinHash family, only
    cross-side band collisions become candidates, and every candidate
    is verified by exact shingle Jaccard before a new row is dropped —
    so the LSH layer is semantically invisible whenever banded recall
    over >= threshold pairs is 1.0 (the ``decontaminate_bloom``
    prefilter precedent; planted-pair recall is pinned by pytest).

    - ``reduce="driver"``: cross-side collision buckets pull to the
      driver (singleton-pruned), candidate texts broadcast, matched
      new-ids broadcast back — for snapshots whose COLLISION set fits
      one machine.
    - ``reduce="partitioned"``: band-key inner join new x ref, two-key
      distinct, per-side text joins, vectorized verify, then a
      ``left_anti`` join drops matched new rows — zero driver state.
    """
    import ray

    def bands_of(ds):
        def task(batch: pa.Table) -> pa.Table:
            fn = MinHashBands(id_col=id_col, text_col=text_col,
                              num_perm=num_perm, num_bands=num_bands,
                              shingle_n=shingle_n)
            return fn(batch)
        return ds.map_batches(task, batch_format="pyarrow")

    if reduce == "partitioned":
        return _near_dedup_incremental_partitioned(
            new_ds, ref_ds, bands_of, id_col, text_col, threshold,
            shingle_n, num_partitions or default_join_partitions())
    if reduce != "driver":
        raise ValueError(f"unknown reduce mode: {reduce!r}")

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8),
                                 pa.int8()))
        return f

    unioned = bands_of(new_ds).map_batches(tag(0), batch_format="pyarrow") \
        .union(bands_of(ref_ds).map_batches(tag(1),
                                            batch_format="pyarrow"))
    btab = _pruned_bucket_pull(unioned, id_col, "band_key")
    cand = set() if btab.num_columns == 0 else _cross_collision_pairs(
        btab[id_col].to_numpy(zero_copy_only=False),
        np.asarray(btab["band_key"].to_pylist(), dtype=object),
        btab["side"].to_numpy(zero_copy_only=False),
    )
    if not cand:
        return new_ds

    from ..functions.minhash import jaccard as exact_jaccard

    def pull_texts(ds, wanted):
        ids_arr = pa.array(sorted(wanted), pa.int64())
        ref = ray.put(ids_arr)

        def keep(batch: pa.Table) -> pa.Table:
            return batch.select([id_col, text_col]).filter(
                _keep_mask_isin(batch[id_col], ray.get(ref)))

        df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
        return {i: word_shingles(t, shingle_n)
                for i, t in zip(df[id_col], df[text_col])}

    new_sh = pull_texts(new_ds, {n for n, _ in cand})
    ref_sh = pull_texts(ref_ds, {r for _, r in cand})
    matched = sorted({
        n for n, r in cand
        if np.round(exact_jaccard(new_sh[n], ref_sh[r]), 6) >= threshold
    })
    if not matched:
        return new_ds
    matched_ref = ray.put(pa.array(matched, pa.int64()))

    def drop_matched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            _keep_mask_isin(batch[id_col], ray.get(matched_ref))))

    return new_ds.map_batches(drop_matched, batch_format="pyarrow")


def _near_dedup_incremental_partitioned(new_ds, ref_ds, bands_of,
                                        id_col, text_col, threshold,
                                        shingle_n, num_partitions):
    from ray.data.aggregate import Count

    # both band sides guarded: an EMPTY side (fresh corpus / empty
    # snapshot) yields only schema-less zero-row blocks and the
    # band_key join fails exactly as ensure_schema documents; the two
    # sentinel rows join only with each other and their INT64_MIN ids
    # never match a real text row downstream
    ref_bands = ensure_schema(
        bands_of(ref_ds).map_batches(
            lambda b: b.rename_columns(["ref_id", "band_key"]),
            batch_format="pyarrow"),
        pa.schema([("ref_id", pa.int64()), ("band_key", pa.string())]),
        num_blocks=num_partitions)
    new_bands = ensure_schema(
        bands_of(new_ds),
        pa.schema([(id_col, pa.int64()), ("band_key", pa.string())]),
        num_blocks=num_partitions)
    joined = new_bands.join(
        ref_bands, "inner", num_partitions=num_partitions,
        on=("band_key",))
    pairs = joined.map_batches(
        lambda b: pa.table({
            "new_id": b[id_col].cast(pa.int64()),
            "ref_id": b["ref_id"].cast(pa.int64())}),
        batch_format="pyarrow") \
        .groupby(["new_id", "ref_id"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    pairs = ensure_schema(pairs, pa.schema([("new_id", pa.int64()),
                                            ("ref_id", pa.int64())]),
                          num_blocks=num_partitions)
    # text sides guarded too (empty snapshot/corpus); the surviving
    # all-sentinel pair verifies as matched new_id = INT64_MIN, which
    # the final left_anti can never match against a real row
    texts_new = ensure_schema(
        new_ds.map_batches(
            lambda b: b.select([id_col, text_col])
                       .rename_columns(["new_id", "text_new"]),
            batch_format="pyarrow"),
        pa.schema([("new_id", pa.int64()), ("text_new", pa.string())]),
        num_blocks=num_partitions)
    texts_ref = ensure_schema(
        ref_ds.map_batches(
            lambda b: b.select([id_col, text_col])
                       .rename_columns(["ref_id", "text_ref"]),
            batch_format="pyarrow"),
        pa.schema([("ref_id", pa.int64()), ("text_ref", pa.string())]),
        num_blocks=num_partitions)
    joined = pairs.join(texts_new, "inner",
                        num_partitions=num_partitions, on=("new_id",))
    joined = ensure_schema(joined, pa.schema([
        ("new_id", pa.int64()), ("ref_id", pa.int64()),
        ("text_new", pa.string())]), num_blocks=num_partitions)
    joined = joined.join(texts_ref, "inner",
                         num_partitions=num_partitions, on=("ref_id",))

    def verify(batch: pa.Table) -> pa.Table:
        from ..functions.minhash import jaccard as exact_jaccard

        cache: dict = {}

        def sh(key, text):
            s = cache.get(key)
            if s is None:
                s = cache[key] = word_shingles(text, shingle_n)
            return s

        n_ids = batch["new_id"].to_pylist()
        r_ids = batch["ref_id"].to_pylist()
        scores = np.round([
            exact_jaccard(sh(("n", a), ta), sh(("r", b), tb))
            for a, b, ta, tb in zip(n_ids, r_ids,
                                    batch["text_new"].to_pylist(),
                                    batch["text_ref"].to_pylist())
        ], 6)
        keep = scores >= threshold
        return pa.table({
            "new_id": pa.array(
                np.asarray(n_ids, dtype=np.int64)[keep], pa.int64()),
        })

    matched = joined.map_batches(verify, batch_format="pyarrow") \
        .groupby("new_id").aggregate(Count(alias_name="_n")) \
        .map_batches(
            lambda b: pa.table({id_col: b["new_id"].cast(pa.int64())}),
            batch_format="pyarrow")
    matched = ensure_schema(matched, pa.schema([(id_col, pa.int64())]),
                            num_blocks=num_partitions)
    return new_ds.join(matched, "left_anti",
                       num_partitions=num_partitions, on=(id_col,))
