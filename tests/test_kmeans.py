"""Distributed k-means (stages/kmeans.py) planted-data tests.

The sf0.01 DuckDB gate (test_driver_queries::kmeans_embeddings) pins
the full unrolled-Lloyd's parity; these tests pin the stage-level
contracts the gate can't isolate: block-split invariance, the
empty-cluster COALESCE path, argmin optimality of the final
assignment, and the half-away rounding mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.kmeans import (
    kmeans_assign,
    kmeans_fit,
    round_half_away,
)


def _ds(mat: np.ndarray, num_blocks: int = 1):
    import ray.data

    tab = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(list(mat.astype(np.float64)),
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tab)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


def _planted(n: int = 120, dim: int = 8, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, dim)) * 5.0
    return np.concatenate(
        [c + rng.normal(size=(n // 3, dim)) * 0.3 for c in centers])


class TestKMeans:
    def test_block_split_invariance(self, ray_session):
        mat = _planted()
        ref = None
        for blocks in (1, 7):
            cent = kmeans_fit(_ds(mat, blocks), k=4, assign_rounds=3)
            out = kmeans_assign(_ds(mat, blocks), cent) \
                .sort("vec_id").to_pandas()
            if ref is None:
                ref, cref = out, cent
            else:
                assert out.equals(ref)
                assert np.array_equal(cent, cref)

    def test_assignment_is_argmin(self, ray_session):
        mat = _planted(seed=11)
        cent = kmeans_fit(_ds(mat), k=4, assign_rounds=2)
        out = kmeans_assign(_ds(mat), cent).sort("vec_id").to_pandas()
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assert np.array_equal(out["cluster"].to_numpy(),
                              np.argmin(d2, axis=1))

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        # a centroid no point is nearest to must survive the update
        # unchanged (the SQL COALESCE(avg, prev) branch)
        from modernsearchengines_ray.stages.kmeans import \
            _update_centroids
        mat = np.vstack([np.zeros((4, 3)), np.ones((4, 3))])
        cent = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                         [100.0, 100.0, 100.0]])
        out = _update_centroids(_ds(mat, num_blocks=3), cent,
                                emb_col="embedding")
        assert np.array_equal(out[0], np.zeros(3))
        assert np.array_equal(out[1], np.ones(3))
        assert np.array_equal(out[2], cent[2])

    def test_fewer_points_than_k(self, ray_session):
        mat = _planted()[:3]
        cent = kmeans_fit(_ds(mat), k=8, assign_rounds=2)
        assert cent.shape == (3, 8)

    def test_empty_input(self, ray_session):
        assert kmeans_fit(_ds(_planted()[:0]), k=4,
                          assign_rounds=2) is None


class TestPQ:
    def test_block_split_invariance_and_argmin(self, ray_session):
        from modernsearchengines_ray.stages.kmeans import (
            _assign,
            pq_assign,
            pq_fit,
        )
        mat = _planted(n=120, dim=8, seed=3)
        ref = None
        for blocks in (1, 5):
            cents = pq_fit(_ds(mat, blocks), m=2, k=4, assign_rounds=2)
            out = pq_assign(_ds(mat, blocks), cents) \
                .sort(["vec_id", "sub"]).to_pandas()
            if ref is None:
                ref = out
                assert cents.shape == (2, 4, 4)
                # each code is the argmin codeword of its subvector
                codes = out["code"].to_numpy().reshape(-1, 2)
                for s in range(2):
                    want = _assign(mat[:, s * 4:(s + 1) * 4], cents[s])
                    assert np.array_equal(codes[:, s], want)
            else:
                assert out.equals(ref)

    def test_indivisible_dim_raises(self, ray_session):
        from modernsearchengines_ray.stages.kmeans import pq_fit
        with pytest.raises(ValueError):
            pq_fit(_ds(_planted(n=30, dim=8)), m=3, k=2,
                   assign_rounds=2)

    def test_quantization_reduces_with_more_codes(self, ray_session):
        # reconstruction MSE with k=8 codewords must beat k=1 (the
        # mean) -- a basic sanity bound on the trained codebooks
        from modernsearchengines_ray.stages.kmeans import pq_assign, pq_fit
        mat = _planted(n=120, dim=8, seed=5)

        def mse(k):
            cents = pq_fit(_ds(mat), m=2, k=k, assign_rounds=3)
            codes = pq_assign(_ds(mat), cents).sort(["vec_id", "sub"]) \
                .to_pandas()["code"].to_numpy().reshape(-1, 2)
            rec = np.concatenate(
                [cents[s][codes[:, s]] for s in range(2)], axis=1)
            return ((mat - rec) ** 2).mean()

        assert mse(8) < mse(1)


def test_round_half_away_matches_sql_round():
    # numpy half-even would give 0.123456 for the first case; DuckDB
    # ROUND (half away from zero) gives 0.123457 -- the engine must
    # follow SQL.
    x = np.array([0.1234565, -0.1234565, 1.25e-6, 0.0])
    got = round_half_away(x)
    assert got[0] == pytest.approx(0.123457, abs=1e-12)
    assert got[1] == pytest.approx(-0.123457, abs=1e-12)
    assert got[2] == pytest.approx(1e-6, abs=1e-18)
    assert got[3] == 0.0
