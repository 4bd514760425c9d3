"""Distributed Lloyd's k-means over an embedding column.

The clustering primitive behind semantic sharding, data-mixing /
curriculum bucketing and the IVF coarse quantizer (stages/ann.py trains
its centroids on a driver sample; this stage is the full-corpus
multi-pass variant).  Plan shape per assignment round:

- centroids are O(k x dim) and ship inside the batch-fn closure (a few
  KB -- far below the broadcast threshold; at k*dim worth MBs switch to
  ``ray.put`` like stages/ann.py's centroid table);
- ONE streaming pass over the corpus computes per-(block, cluster)
  partial sums -- O(blocks * k) rows leave the cluster, never points;
- the driver reduce is O(k * dim): combine partials, mean, round.

Nothing materializes the corpus: each round re-reads the (lazy) input
dataset, which at 100 TB is the spill-safe choice vs pinning a
materialized copy in the object store.  Determinism: init = the k
smallest ids' vectors (per-block partial heads, O(blocks*k) merge), argmin ties
break to the smallest cluster index, and every centroid update is
rounded half-away-from-zero to 6 decimals -- the same contract DuckDB's
``ROUND`` applies -- so the driver entry's unrolled-CTE SQL oracle
(driver_queries._sql_kmeans) tracks this plan decision-for-decision.

Reference scope note: the reference engine has no clustering stage;
this extends the LDA/TF-IDF topic family (reference topic.py) with the
geometric counterpart the LLM-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowlist import list_matrix

ROUND_DECIMALS = 6


def round_half_away(x: np.ndarray, decimals: int = ROUND_DECIMALS):
    """Round half away from zero -- DuckDB ``ROUND`` semantics.

    numpy's ``np.round`` is half-to-even; a centroid coordinate landing
    exactly on a half-ulp boundary would then diverge from the SQL
    oracle, so the engine mirrors the SQL rounding mode instead.
    """
    f = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * f + 0.5), x) / f


def _assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c sum_dim (x - c)^2, ties to the smallest cluster index.

    The SQUARED-DIFFERENCE form (not the expanded |x|^2 - 2x.c + |c|^2
    matmul identity) deliberately matches the SQL oracle's
    SUM((x - cx) * (x - cx)) term-for-term, so near-tie argmin
    decisions agree across engines.  k * dim is small; the (n, k, dim)
    temporary is bounded by the batch size.
    """
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _k_smallest(ds, k: int, id_col: str, emb_col: str) -> list[dict]:
    """The k smallest-id rows WITHOUT a global sort: each block emits
    its local k-head (one argsort partition per block), the driver
    merges O(blocks × k) rows — versus ``sort().limit(k)``'s
    all-to-all exchange of the whole corpus for a k-row head.  At
    10^5 blocks × k=16 the driver holds ~10^6 id+vector rows, still
    far below one exchange partition."""

    def local_head(batch: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, pa.int64()),
                            (emb_col, pa.list_(pa.float64()))])
        if batch.num_rows == 0:
            return schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        sel = batch.take(pa.array(take))
        return pa.table({
            id_col: sel[id_col].cast(pa.int64()),
            emb_col: sel[emb_col].cast(pa.list_(pa.float64())),
        })

    rows = ds.map_batches(local_head, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return rows[:k]


def kmeans_fit(ds, k: int, assign_rounds: int,
               id_col: str = "vec_id", emb_col: str = "embedding"):
    """Fit centroids with ``assign_rounds`` assignment passes and
    ``assign_rounds - 1`` centroid updates between them (the final
    assignment is the caller's to compute via :func:`kmeans_assign`
    against the returned centroids).

    Returns the (k', dim) float64 centroid matrix (k' = min(k, n),
    rounded to 6 decimals), or ``None`` for an empty input.
    """
    head = _k_smallest(ds, k, id_col, emb_col)
    if not head:
        return None
    init = np.asarray([row[emb_col] for row in head], dtype=np.float64)
    cent = round_half_away(init)
    for _ in range(assign_rounds - 1):
        cent = _update_centroids(ds, cent, emb_col=emb_col)
    return cent


def _update_centroids(ds, cent: np.ndarray, emb_col: str) -> np.ndarray:
    kk, dim = cent.shape

    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([("cluster", pa.int64()), ("n", pa.int64()),
                            ("vsum", pa.list_(pa.float64()))])
        if n == 0:
            return schema.empty_table()
        mat = list_matrix(batch[emb_col].combine_chunks(), n)
        a = _assign(mat, cent)
        counts = np.bincount(a, minlength=kk).astype(np.int64)
        sums = np.zeros((kk, dim), dtype=np.float64)
        np.add.at(sums, a, mat)
        return pa.table({
            "cluster": pa.array(np.arange(kk, dtype=np.int64)),
            "n": pa.array(counts),
            "vsum": pa.array(list(sums), pa.list_(pa.float64())),
        })

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    counts = np.zeros(kk, dtype=np.int64)
    sums = np.zeros((kk, dim), dtype=np.float64)
    for r in rows:
        counts[r["cluster"]] += r["n"]
        sums[r["cluster"]] += np.asarray(r["vsum"], dtype=np.float64)
    out = cent.copy()
    nz = counts > 0
    # empty cluster keeps its previous (already-rounded) centroid --
    # the SQL mirror's COALESCE(avg, prev)
    out[nz] = round_half_away(sums[nz] / counts[nz, None])
    return out


def pq_fit(ds, m: int, k: int, assign_rounds: int,
           id_col: str = "vec_id", emb_col: str = "embedding"):
    """Product-quantization codebooks (Jégou et al. 2011): the vector
    is split into ``m`` contiguous subspaces and each trains an
    INDEPENDENT k-means codebook — but all ``m`` trainings share every
    corpus pass (one partials map emits (sub, cluster, n, vsum) rows
    for all subspaces at once, O(blocks × m × k) rows total), so the
    cost over ``assign_rounds`` is identical to one full-dim k-means,
    not m of them.  Init for every subspace = the k smallest ids'
    sub-vectors (one shared partial-head election); the same rounding /
    tie / empty-cluster contract as :func:`kmeans_fit` keeps the SQL
    oracle in lockstep.

    Returns the (m, k', d_sub) float64 codebook tensor or ``None`` for
    an empty input.
    """
    head = _k_smallest(ds, k, id_col, emb_col)
    if not head:
        return None
    init = np.asarray([row[emb_col] for row in head], dtype=np.float64)
    dim = init.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents = round_half_away(
        init.reshape(len(head), m, dsub).transpose(1, 0, 2)).copy()
    for _ in range(assign_rounds - 1):
        cents = _pq_update(ds, cents, emb_col=emb_col)
    return cents


def _pq_update(ds, cents: np.ndarray, emb_col: str) -> np.ndarray:
    m, kk, dsub = cents.shape

    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([("sub", pa.int64()), ("cluster", pa.int64()),
                            ("n", pa.int64()),
                            ("vsum", pa.list_(pa.float64()))])
        if n == 0:
            return schema.empty_table()
        mat = list_matrix(batch[emb_col].combine_chunks(), n)
        subs, clusters, counts, sums = [], [], [], []
        for s in range(m):
            X = mat[:, s * dsub:(s + 1) * dsub]
            a = _assign(X, cents[s])
            c = np.bincount(a, minlength=kk).astype(np.int64)
            sm = np.zeros((kk, dsub), dtype=np.float64)
            np.add.at(sm, a, X)
            subs.append(np.full(kk, s, dtype=np.int64))
            clusters.append(np.arange(kk, dtype=np.int64))
            counts.append(c)
            sums.append(sm)
        return pa.table({
            "sub": pa.array(np.concatenate(subs)),
            "cluster": pa.array(np.concatenate(clusters)),
            "n": pa.array(np.concatenate(counts)),
            "vsum": pa.array(list(np.vstack(sums)),
                             pa.list_(pa.float64())),
        })

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    counts = np.zeros((m, kk), dtype=np.int64)
    sums = np.zeros((m, kk, dsub), dtype=np.float64)
    for r in rows:
        counts[r["sub"], r["cluster"]] += r["n"]
        sums[r["sub"], r["cluster"]] += np.asarray(r["vsum"],
                                                   dtype=np.float64)
    out = cents.copy()
    nz = counts > 0
    out[nz] = round_half_away(sums[nz] / counts[nz][:, None])
    return out


def pq_assign(ds, cents: np.ndarray,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """One streaming pass: long-format (id, sub, code) PQ codes —
    the m × ceil(log2 k)-bit compressed representation an IVF-PQ
    index stores per vector."""
    m, kk, dsub = cents.shape

    def assign_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([(id_col, pa.int64()), ("sub", pa.int64()),
                            ("code", pa.int64())])
        if n == 0:
            return schema.empty_table()
        mat = list_matrix(batch[emb_col].combine_chunks(), n)
        ids = batch[id_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            codes[:, s] = _assign(mat[:, s * dsub:(s + 1) * dsub],
                                  cents[s])
        return pa.table({
            id_col: pa.array(np.repeat(ids, m), pa.int64()),
            "sub": pa.array(np.tile(np.arange(m, dtype=np.int64), n)),
            "code": pa.array(codes.reshape(-1), pa.int64()),
        })

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def kmeans_assign(ds, cent: np.ndarray,
                  id_col: str = "vec_id", emb_col: str = "embedding"):
    """One streaming pass: (id, cluster) for every row."""

    def assign_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([(id_col, pa.int64()),
                            ("cluster", pa.int64())])
        if n == 0:
            return schema.empty_table()
        mat = list_matrix(batch[emb_col].combine_chunks(), n)
        a = _assign(mat, cent).astype(np.int64)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster": pa.array(a, pa.int64()),
        })

    return ds.map_batches(assign_batch, batch_format="pyarrow")
