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
               iters: int = 10) -> np.ndarray:
    """Plain seeded Lloyd's on normalized vectors (cosine ~ euclidean
    on the unit sphere).  Driver-side; sample-sized input."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    picks = rng.choice(len(sample), size=min(num_clusters, len(sample)),
                       replace=False)
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
