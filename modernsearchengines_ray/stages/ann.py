"""Approximate nearest neighbour over an embedding column.

Two paths over ``(id, list<float>)`` datasets:

- :func:`brute_force_topk` — the exact baseline: per-batch matmul of
  zero-copy Arrow batches against a broadcast query matrix, per-block
  partial top-k, driver heap merge.  Linear scan; correct at any scale,
  cost O(rows x dim x queries).
- :class:`IVFIndex` — the scale path: seeded k-means coarse quantizer
  fit on a driver-side sample, cluster assignment as a streaming
  ``map_batches`` (broadcast centroids), bucketed parquet layout, and
  queries that probe only the ``nprobe`` nearest buckets.  Scan cost
  drops by ~num_clusters/nprobe; recall is tunable via nprobe
  (tests pin recall@10 >= 0.9 on the fixture).

Everything is deterministic: fixed k-means seed, fixed iteration
count, ties broken by id.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    from ..functions.arrowlist import list_matrix

    return list_matrix(batch[vec_col], batch.num_rows)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k per query row of ``query_vecs`` (q x dim).

    Returns a pandas DataFrame (query_idx, rank, id, cos_sim)."""
    import pandas as pd
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_matrix(batch, vec_col))
        sims = qm @ mat.T                      # q x batch
        take = min(k, sims.shape[1])
        idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        rows = {"query_idx": [], id_col: [], "cos_sim": []}
        for qi in range(sims.shape[0]):
            rows["query_idx"].extend([qi] * take)
            rows[id_col].extend(ids[idx[qi]])
            rows["cos_sim"].extend(sims[qi, idx[qi]])
        return pa.table({
            "query_idx": pa.array(rows["query_idx"], pa.int32()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "cos_sim": pa.array(rows["cos_sim"], pa.float64()),
        })

    # final merge over q x k x blocks partial rows, vectorized
    # (lexsort + run-relative rank; no per-query pandas loop)
    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    qs = parts["query_idx"].to_numpy()
    ids = parts[id_col].to_numpy()
    sims = parts["cos_sim"].to_numpy()
    order = np.lexsort((ids, -sims, qs))
    qs, ids, sims = qs[order], ids[order], sims[order]
    new = np.ones(len(qs), dtype=bool)
    new[1:] = qs[1:] != qs[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(qs)), 0))
    rank = np.arange(len(qs)) - run_start
    keep = rank < k
    return pd.DataFrame({
        "query_idx": qs[keep].astype("int32"),
        "rank": rank[keep].astype("int64"),
        id_col: ids[keep].astype("int64"),
        "cos_sim": sims[keep],
    })


def kmeans_fit(sample: np.ndarray, num_clusters: int, seed: int = 42,
               iters: int = 10, init: str = "random") -> np.ndarray:
    """Plain seeded Lloyd's on normalized vectors (cosine ~ euclidean
    on the unit sphere).  Driver-side; sample-sized input.

    ``init="random"`` (default, the committed-hash behavior of the
    IVF entries) seeds from a uniform pick; ``init="greedy"`` seeds
    farthest-point (the :func:`kmeans_fit_distributed` init), which a
    cluster-ORDERED sample needs — a uniform pick can drop two seeds
    in one natural cluster and Lloyd's never recovers the split, the
    failure mode mutual_nn_ivf's nprobe recall depends on avoiding."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    k = min(num_clusters, len(sample))
    if init == "greedy":
        chosen = [int(rng.randint(len(sample)))]
        min_sim = sample @ sample[chosen[0]]
        while len(chosen) < k:
            nxt = int(np.argmin(min_sim))
            chosen.append(nxt)
            min_sim = np.maximum(min_sim, sample @ sample[nxt])
        picks = np.array(chosen)
    elif init == "random":
        picks = rng.choice(len(sample), size=k, replace=False)
    else:
        raise ValueError(f"unknown init: {init!r}")
    centroids = sample[np.sort(picks)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def kmeans_fit_distributed(ds, num_clusters: int, seed: int = 42,
                           iters: int = 10, vec_col: str = "embedding"):
    """Lloyd's over the FULL dataset, distributed: per iteration one
    ``map_batches`` pass emits per-cluster partial (sum, count) given
    the broadcast centroids, and the driver reduces k x dim — the
    classic partial-aggregate shape (no shuffle; driver state is the
    centroid matrix only, independent of row count).

    Init is seeded farthest-point over a head sample; assignments are
    argmax cosine on the unit sphere.  This is the 10^12-row tier of
    the IVF build: the sample-based driver fit stays the default (a
    coarse quantizer only needs a representative sample), this path
    exists for corpora whose head sample is not representative."""
    import ray

    first = ds.limit(max(num_clusters * 10, 256)).to_pandas()[vec_col]
    sample = _normalize(np.stack(first.to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    # farthest-point (k-means++ -style greedy) init: a uniform pick
    # from the head sample degenerates when the input is
    # cluster-ordered (two seeds in one cluster, none in another) and
    # Lloyd's cannot recover from an empty cluster
    chosen = [int(rng.randint(len(sample)))]
    min_sim = sample @ sample[chosen[0]]
    while len(chosen) < min(num_clusters, len(sample)):
        nxt = int(np.argmin(min_sim))
        chosen.append(nxt)
        min_sim = np.maximum(min_sim, sample @ sample[nxt])
    centroids = sample[sorted(chosen)].copy()

    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            mat = _normalize(_matrix(batch, vec_col))
            assign = np.argmax(mat @ cents.T, axis=1)
            k, dim = cents.shape
            sums = np.zeros((k, dim))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "vec_sum": pa.array(sums.tolist(),
                                    pa.list_(pa.float64())),
                "n": pa.array(counts.astype(np.int64)),
            })

        parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        k, dim = centroids.shape
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for c, vs, n in zip(parts["cluster"], parts["vec_sum"], parts["n"]):
            sums[c] += np.asarray(vs)
            counts[c] += n
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = _normalize(centroids)
    return centroids


class IVFIndex:
    """Coarse-quantized ANN index: bucketed parquet + centroid table."""

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 id_col: str, vec_col: str):
        self.index_dir = index_dir
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(cls, ds, index_dir: str, num_clusters: int = 16,
              sample_size: int = 10_000, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              fit: str = "sample"):
        """Fit the quantizer (``fit="sample"``: driver k-means on a
        head sample — default, a coarse quantizer only needs coverage;
        ``fit="distributed"``: full-data Lloyd's via
        :func:`kmeans_fit_distributed`), assign every row, write
        hash-bucketed parquet (one directory per cluster)."""
        import ray

        os.makedirs(index_dir, exist_ok=True)
        if fit == "distributed":
            centroids = kmeans_fit_distributed(ds, num_clusters, seed=seed,
                                               vec_col=vec_col)
        elif fit == "sample":
            sample_rows = ds.limit(sample_size).select_columns([vec_col]) \
                .to_pandas()[vec_col]
            sample = np.stack(sample_rows.to_numpy())
            centroids = kmeans_fit(sample, num_clusters, seed=seed)
        else:
            raise ValueError(f"unknown fit mode: {fit!r}")
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
        cent_ref = ray.put(centroids)

        def assign(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            mat = _normalize(_matrix(batch, vec_col))
            cluster = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cluster))

        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "buckets"),
            partition_cols=["cluster"],
        )
        return cls(index_dir, centroids, id_col, vec_col)

    @classmethod
    def load(cls, index_dir: str, id_col: str = "vec_id",
             vec_col: str = "embedding"):
        centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        return cls(index_dir, centroids, id_col, vec_col)

    def search(self, query_vec: np.ndarray, k: int = 10, nprobe: int = 4):
        """Top-k of the ``nprobe`` nearest buckets.  Returns
        [(id, cos_sim)] sorted desc, ties by id."""
        import pyarrow.dataset as pads

        qv = _normalize(np.atleast_2d(np.asarray(query_vec,
                                                 dtype=np.float64)))[0]
        order = np.argsort(-(self.centroids @ qv))
        probes = [int(c) for c in order[:nprobe]]
        dataset = pads.dataset(os.path.join(self.index_dir, "buckets"),
                               partitioning="hive")
        table = dataset.to_table(
            columns=[self.id_col, self.vec_col],
            filter=pads.field("cluster").isin(probes),
        )
        if table.num_rows == 0:
            return []
        ids = table[self.id_col].to_numpy()
        mat = _normalize(_matrix(table, self.vec_col))
        sims = mat @ qv
        order = np.lexsort((ids, -sims))[:k]
        return [(int(ids[i]), float(sims[i])) for i in order]


def mutual_nn_ivf(ds, label_a: int, label_b: int, *,
                  num_clusters: int = 8, nprobe: int | None = None,
                  sample_size: int = 10_000, seed: int = 42,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  label_col: str = "label",
                  num_partitions: int | None = None):
    """Mutual nearest neighbours between two label groups, IVF-bucketed
    (the ``reduce="partitioned"`` tier of the driver's ``mutual_nn``
    entry): the broadcast-B-matrix plan is replaced by a shared coarse
    quantizer, so the ONLY driver/broadcast state is the k x dim
    centroid matrix — never a side's full embedding matrix (the 10^9-row
    handoff the broadcast plan's docstring documents).

    Plan (one exchange, zero driver row state):

    1. fit seeded k-means centroids on a head sample of the union;
    2. one streaming pass tags each row with its resident cluster
       (role=0, serves the OTHER side's probes) and its ``nprobe``
       nearest probe clusters (role=1, searches the other side's
       residents) — fan-out <= 1 + nprobe rows per input row;
    3. one ``keyed_blocks`` hash exchange on ``cluster``; a per-block
       kernel loops the block's clusters and matmuls A-probes x
       B-residents and B-probes x A-residents (residents id-sorted so
       the first argmax takes the smallest id on ties), emitting one
       best-candidate row per (probe row, cluster);
    4. per-direction folds (keyed exchange on a_id / b_id + vectorized
       first-per-run after ``lexsort((b_id, -sim, a_id))``) finish the
       argmax across probed clusters; an inner join keeps mutual pairs.

    ``nprobe=None`` probes every cluster: the result is then EXACT and
    equal to the broadcast plan / the SQL oracle (how the driver gates
    this tier); ``nprobe < num_clusters`` is the approximate scale path
    whose recall the planted-cluster pytest pins.  Cosine is raw
    ``dot / (|a||b|)`` per pair, matching the ann family and DuckDB's
    ``list_cosine_similarity``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from ..stages.dedup import (default_join_partitions, drop_sentinels,
                                ensure_schema, hash_shuffle_context)
    from ..stages.windows import keyed_blocks

    if nprobe is None:
        nprobe = num_clusters
    nprobe = min(nprobe, num_clusters)
    nparts = num_partitions or default_join_partitions()
    out_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                            ("cos_sim", pa.float64())])

    head = ds.limit(sample_size).select_columns([vec_col]) \
        .to_pandas()[vec_col]
    if len(head) == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    centroids = kmeans_fit(np.stack(head.to_numpy()), num_clusters,
                           seed=seed, init="greedy")
    cent_ref = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mask = pc.or_(pc.equal(batch[label_col], label_a),
                      pc.equal(batch[label_col], label_b))
        batch = batch.filter(mask)
        n = batch.num_rows
        if n == 0:
            return pa.schema([
                ("cluster", pa.int64()), ("side", pa.int8()),
                ("role", pa.int8()), ("rid", pa.int64()),
                ("vec", pa.list_(pa.float64())),
            ]).empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        side = (batch[label_col].to_numpy(zero_copy_only=False)
                == label_b).astype(np.int8)
        mat = _matrix(batch, vec_col).astype(np.float64)
        csims = _normalize(mat) @ cents.T            # n x k
        # probe clusters = nprobe best by centroid sim (order within
        # the probe set is irrelevant: the fold takes a global max)
        k = csims.shape[1]
        if nprobe >= k:
            probes = np.tile(np.arange(k, dtype=np.int64), n)
        else:
            probes = np.argpartition(-csims, nprobe - 1, axis=1) \
                [:, :nprobe].astype(np.int64).ravel()
        resident = np.argmax(csims, axis=1).astype(np.int64)
        take = min(nprobe, k)
        vec = pa.array(mat.tolist(), pa.list_(pa.float64()))
        res_t = pa.table({
            "cluster": pa.array(resident, pa.int64()),
            "side": pa.array(side, pa.int8()),
            "role": pa.array(np.zeros(n, np.int8), pa.int8()),
            "rid": pa.array(ids, pa.int64()),
            "vec": vec,
        })
        rep = pa.array(np.repeat(np.arange(n), take))
        probe_t = pa.table({
            "cluster": pa.array(probes, pa.int64()),
            "side": pa.array(np.repeat(side, take), pa.int8()),
            "role": pa.array(np.ones(n * take, np.int8), pa.int8()),
            "rid": pa.array(np.repeat(ids, take), pa.int64()),
            "vec": vec.take(rep),
        })
        return pa.concat_tables([res_t, probe_t])

    tagged = keyed_blocks(ds.map_batches(tag, batch_format="pyarrow"),
                          ["cluster"], num_partitions=nparts)

    cand_schema = pa.schema([("dir", pa.int8()), ("a_id", pa.int64()),
                             ("b_id", pa.int64()), ("sim", pa.float64())])

    def per_cluster(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return cand_schema.empty_table()
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        side = batch["side"].to_numpy(zero_copy_only=False)
        role = batch["role"].to_numpy(zero_copy_only=False)
        ids = batch["rid"].to_numpy(zero_copy_only=False)
        mat = _matrix(batch, "vec").astype(np.float64)
        norm = np.linalg.norm(mat, axis=1)
        out = []

        def direction(d, pi, ri):
            # probes of one side vs id-sorted residents of the other
            if len(pi) == 0 or len(ri) == 0:
                return
            ri = ri[np.argsort(ids[ri], kind="stable")]
            sims = (mat[pi] @ mat[ri].T) \
                / np.outer(norm[pi], norm[ri])
            j = np.argmax(sims, axis=1)            # first max = min id
            p_ids, r_ids = ids[pi], ids[ri][j]
            best = sims[np.arange(len(pi)), j]
            a = p_ids if d == 0 else r_ids
            b = r_ids if d == 0 else p_ids
            out.append(pa.table({
                "dir": pa.array(np.full(len(pi), d, np.int8), pa.int8()),
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "sim": pa.array(best, pa.float64()),
            }))

        order = np.argsort(cl, kind="stable")
        bounds = np.flatnonzero(
            np.r_[True, cl[order][1:] != cl[order][:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            rows = order[s:e]
            m_side, m_role = side[rows], role[rows]

            def sel(sd, rl):
                return rows[(m_side == sd) & (m_role == rl)]

            direction(0, sel(0, 1), sel(1, 0))     # A probes x B res
            direction(1, sel(1, 1), sel(0, 0))     # B probes x A res
        if not out:
            return cand_schema.empty_table()
        return pa.concat_tables(out)

    cands = tagged.map_batches(per_cluster, batch_size=None,
                               batch_format="pyarrow").materialize()
    if cands.count() == 0:
        # either label group is empty (no probes or no residents in
        # any direction): the SQL mirror of a cross join against an
        # empty side.  count() on the materialized candidates is
        # O(1) metadata, and returning here avoids the all-empty
        # plan whose blocks lose their schema (the ADVICE r4
        # empty-parts guard family).
        return ray.data.from_arrow(out_schema.empty_table())

    def fold(key: str):
        """Finish one direction's argmax: co-locate by key, then one
        vectorized first-per-run pass (max sim, ties to the smaller
        other-side id)."""
        other = "b_id" if key == "a_id" else "a_id"

        def first_per_run(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.schema([("a_id", pa.int64()),
                                  ("b_id", pa.int64()),
                                  ("sim", pa.float64())]).empty_table()
            kv = batch[key].to_numpy(zero_copy_only=False)
            ov = batch[other].to_numpy(zero_copy_only=False)
            sv = batch["sim"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ov, -sv, kv))
            kv = kv[order]
            keep = np.r_[True, kv[1:] != kv[:-1]]
            idx = pa.array(order[keep])
            return batch.select(["a_id", "b_id", "sim"]).take(idx)

        d = 0 if key == "a_id" else 1
        side = cands.filter(
            expr=f"dir == {d}").drop_columns(["dir"])
        return keyed_blocks(side, [key], num_partitions=nparts) \
            .map_batches(first_per_run, batch_size=None,
                         batch_format="pyarrow")

    # BOTH sides guarded: when one label group is empty, nn_ab itself
    # has only schema-less zero-row blocks and Acero fails exactly as
    # ensure_schema documents.  The two sentinel rows carry identical
    # key values, so they inner-join with EACH OTHER — the final
    # drop_sentinels removes that one pair.  hash_shuffle_context: the
    # sentinel union's from_arrow snapshots the GLOBAL DataContext at
    # creation, and the unioned plan executes the folds' keyed
    # repartitions under THAT snapshot — without the flip they fail
    # ("key-based repartitioning only supported for HASH_SHUFFLE").
    with hash_shuffle_context():
        nn_ab = ensure_schema(
            fold("a_id"),
            pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                       ("sim", pa.float64())]), num_blocks=nparts)
        nn_ba = fold("b_id").drop_columns(["sim"])
        guarded = ensure_schema(
            nn_ba, pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())]),
            num_blocks=nparts)
        mutual = nn_ab.join(guarded, "inner", num_partitions=nparts,
                            on=("a_id", "b_id"))

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table({
                "a_id": batch["a_id"].cast(pa.int64()),
                "b_id": batch["b_id"].cast(pa.int64()),
                "cos_sim": pa.array(
                    np.round(batch["sim"].to_numpy(zero_copy_only=False),
                             6),
                    pa.float64()),
            })

        return drop_sentinels(
            mutual.map_batches(finish, batch_format="pyarrow"), "a_id")


def hard_negatives_ivf(ds, *, num_clusters: int = 8,
                       nprobe: int | None = None,
                       sample_size: int = 10_000, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label",
                       num_partitions: int | None = None):
    """Hard-negative mining, IVF-bucketed (the ``reduce="partitioned"``
    tier of the driver's ``hard_negatives`` entry): the broadcast
    candidate-matrix plan is replaced by the same shared coarse
    quantizer as ``mutual_nn_ivf`` — the ONLY broadcast state is the
    k x dim centroid matrix, never the corpus's embedding matrix.

    Plan (one exchange, zero driver row state):

    1. seeded k-means centroids on a head sample;
    2. one streaming pass emits each row once as a RESIDENT of its
       nearest cluster and ``nprobe`` times as a PROBE — fan-out
       <= 1 + nprobe rows per input row;
    3. ``keyed_blocks`` hash exchange on ``cluster``; the per-block
       kernel matmuls probes x id-sorted residents per cluster with a
       same-label mask (so the first argmax takes the smallest
       DIFFERENT-label id on ties) and emits one best-candidate row
       per (probe, cluster) — all-masked probes emit nothing;
    4. a keyed fold on the probe id finishes the argmax across probed
       clusters (lexsort: max sim, ties to the smaller neg id).

    ``nprobe=None`` probes every cluster: EXACT, equal to the
    broadcast plan / the SQL oracle (how the driver gates this tier);
    ``nprobe < num_clusters`` is the approximate scale path."""
    import ray

    from ..stages.windows import keyed_blocks

    if nprobe is None:
        nprobe = num_clusters
    nprobe = min(nprobe, num_clusters)
    from ..stages.dedup import default_join_partitions
    nparts = num_partitions or default_join_partitions()
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("neg_id", pa.int64()),
                            ("cos_sim", pa.float64())])

    head = ds.limit(sample_size).select_columns([vec_col]) \
        .to_pandas()[vec_col]
    if len(head) == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    centroids = kmeans_fit(np.stack(head.to_numpy()), num_clusters,
                           seed=seed, init="greedy")
    cent_ref = ray.put(centroids)

    tag_schema = pa.schema([
        ("cluster", pa.int64()), ("role", pa.int8()),
        ("rid", pa.int64()), ("lab", pa.int64()),
        ("vec", pa.list_(pa.float64())),
    ])

    def tag(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        n = batch.num_rows
        if n == 0:
            return tag_schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        labs = batch[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _matrix(batch, vec_col).astype(np.float64)
        csims = _normalize(mat) @ cents.T
        k = csims.shape[1]
        if nprobe >= k:
            probes = np.tile(np.arange(k, dtype=np.int64), n)
        else:
            probes = np.argpartition(-csims, nprobe - 1, axis=1) \
                [:, :nprobe].astype(np.int64).ravel()
        resident = np.argmax(csims, axis=1).astype(np.int64)
        take = min(nprobe, k)
        vec = pa.array(mat.tolist(), pa.list_(pa.float64()))
        rep = pa.array(np.repeat(np.arange(n), take))
        return pa.concat_tables([
            pa.table({
                "cluster": pa.array(resident, pa.int64()),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
                "rid": pa.array(ids, pa.int64()),
                "lab": pa.array(labs, pa.int64()),
                "vec": vec,
            }),
            pa.table({
                "cluster": pa.array(probes, pa.int64()),
                "role": pa.array(np.ones(n * take, np.int8), pa.int8()),
                "rid": pa.array(np.repeat(ids, take), pa.int64()),
                "lab": pa.array(np.repeat(labs, take), pa.int64()),
                "vec": vec.take(rep),
            }),
        ])

    tagged = keyed_blocks(ds.map_batches(tag, batch_format="pyarrow"),
                          ["cluster"], num_partitions=nparts)

    cand_schema = pa.schema([("pid", pa.int64()), ("neg_id", pa.int64()),
                             ("sim", pa.float64())])

    def per_cluster(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return cand_schema.empty_table()
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        role = batch["role"].to_numpy(zero_copy_only=False)
        ids = batch["rid"].to_numpy(zero_copy_only=False)
        labs = batch["lab"].to_numpy(zero_copy_only=False)
        mat = _matrix(batch, "vec").astype(np.float64)
        norm = np.linalg.norm(mat, axis=1)
        out = []
        order = np.argsort(cl, kind="stable")
        bounds = np.flatnonzero(
            np.r_[True, cl[order][1:] != cl[order][:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            rows = order[s:e]
            pi = rows[role[rows] == 1]
            ri = rows[role[rows] == 0]
            if len(pi) == 0 or len(ri) == 0:
                continue
            ri = ri[np.argsort(ids[ri], kind="stable")]
            sims = (mat[pi] @ mat[ri].T) / np.outer(norm[pi], norm[ri])
            sims[labs[pi][:, None] == labs[ri][None, :]] = -np.inf
            j = np.argmax(sims, axis=1)            # first max = min id
            best = sims[np.arange(len(pi)), j]
            ok = np.isfinite(best)                 # all-masked -> drop
            if not ok.any():
                continue
            out.append(pa.table({
                "pid": pa.array(ids[pi][ok], pa.int64()),
                "neg_id": pa.array(ids[ri][j][ok], pa.int64()),
                "sim": pa.array(best[ok], pa.float64()),
            }))
        if not out:
            return cand_schema.empty_table()
        return pa.concat_tables(out)

    cands = tagged.map_batches(per_cluster, batch_size=None,
                               batch_format="pyarrow").materialize()
    if cands.count() == 0:
        # no cross-label pair anywhere (empty input or single label):
        # the SQL mirror of the label-inequality join over no pairs
        return ray.data.from_arrow(out_schema.empty_table())

    def first_per_run(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        kv = batch["pid"].to_numpy(zero_copy_only=False)
        ov = batch["neg_id"].to_numpy(zero_copy_only=False)
        sv = batch["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ov, -sv, kv))
        kv_s = kv[order]
        keep = np.r_[True, kv_s[1:] != kv_s[:-1]]
        idx = order[keep]
        return pa.table({
            "vec_id": pa.array(kv[idx], pa.int64()),
            "neg_id": pa.array(ov[idx], pa.int64()),
            "cos_sim": pa.array(np.round(sv[idx], 6), pa.float64()),
        })

    return keyed_blocks(cands, ["pid"], num_partitions=nparts) \
        .map_batches(first_per_run, batch_size=None,
                     batch_format="pyarrow")
