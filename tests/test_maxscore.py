"""MaxScore kernel: exactness, skipping, and WAND bit-parity."""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_wand import _brute_topk, _make_lists


class TestMaxScoreKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_exact_vs_brute_force(self, seed):
        from modernsearchengines_ray.functions.maxscore import (
            make_cursors,
            maxscore_topk,
        )

        rng = np.random.RandomState(seed)
        rows = _make_lists(rng)
        hits, stats = maxscore_topk(make_cursors(rows, 32), k=10)
        want = _brute_topk(rows, 10)
        assert [(d, round(s, 9)) for d, s in hits] == \
            [(d, round(s, 9)) for d, s in want]

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 11])
    def test_bit_identical_to_wand(self, seed):
        """Exact float equality, not allclose: both kernels must sum
        each doc's contributions in canonical term order."""
        from modernsearchengines_ray.functions.maxscore import maxscore_topk
        from modernsearchengines_ray.functions.wand import (
            make_cursors,
            wand_topk,
        )

        rng = np.random.RandomState(seed)
        rows = _make_lists(rng, n_terms=7)
        w, _ = wand_topk(make_cursors(rows, 32), k=10)
        m, _ = maxscore_topk(make_cursors(rows, 32), k=10)
        assert w == m          # (doc, score) pairs, exact floats

    def test_nonessential_skipping_fires(self):
        """A couple of heavy lists + many light ones: the light lists
        must become non-essential and docs must be pruned without a
        full probe."""
        from modernsearchengines_ray.functions.maxscore import (
            make_cursors,
            maxscore_topk,
        )

        rng = np.random.RandomState(9)
        rows = _make_lists(rng, n_terms=8, n_docs=20000)
        # make two lists dominate: scale their scores up 50x
        for i in (0, 1):
            rows[i]["bm25"] = rows[i]["bm25"] * 50.0
            rows[i]["block_max_bm25"] = rows[i]["block_max_bm25"] * 50.0
        hits, stats = maxscore_topk(make_cursors(rows, 32), k=5)
        want = _brute_topk(rows, 5)
        assert [(d, round(s, 9)) for d, s in hits] == \
            [(d, round(s, 9)) for d, s in want]
        assert stats["nonessential_max"] > 0
        assert stats["skipped_docs"] > 0
        total = sum(len(r["doc_ids"]) for r in rows)
        assert stats["scored"] < total

    def test_segmented_rows_identical(self):
        """Splitting a term's list into sorted segments (separate
        cursors, same order id) changes nothing."""
        from modernsearchengines_ray.functions.maxscore import (
            make_cursors,
            maxscore_topk,
        )

        rng = np.random.RandomState(5)
        rows = _make_lists(rng, n_terms=3)
        seg_rows = []
        for row in rows:
            mask = rng.rand(len(row["doc_ids"])) < 0.5
            parts = []
            for msk in (mask, ~mask):
                ids, sc = row["doc_ids"][msk], row["bm25"][msk]
                bs = 32
                nb = (len(ids) + bs - 1) // bs
                parts.append((ids, sc, ids[::bs], np.array([
                    sc[i * bs:(i + 1) * bs].max() for i in range(nb)
                ])))
            seg_rows.append({
                "doc_ids": np.concatenate([p[0] for p in parts]),
                "bm25": np.concatenate([p[1] for p in parts]),
                "seg_lens": [len(p[0]) for p in parts],
                "block_first_doc": np.concatenate([p[2] for p in parts]),
                "block_max_bm25": np.concatenate([p[3] for p in parts]),
            })
        flat, _ = maxscore_topk(make_cursors(rows, 32), k=10)
        seg, _ = maxscore_topk(make_cursors(seg_rows, 32), k=10)
        assert flat == seg

    def test_empty_and_tiny(self):
        from modernsearchengines_ray.functions.maxscore import maxscore_topk

        hits, stats = maxscore_topk([], k=5)
        assert hits == [] and stats["scored"] == 0
        rng = np.random.RandomState(2)
        rows = _make_lists(rng, n_terms=1, n_docs=400)
        from modernsearchengines_ray.functions.maxscore import make_cursors
        hits, _ = maxscore_topk(make_cursors(rows, 32), k=100)
        assert hits == _brute_topk(rows, 100)


class TestSearchBm25MaxScore:
    @pytest.mark.parametrize("num_scorers", [1, 2])
    def test_engine_parity_with_wand(self, prepared, num_scorers):
        """End-to-end over the real fixture index: algo='maxscore'
        serves the exact (doc, score) list algo='wand' serves."""
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _, index_dir, _, _ = prepared
        engine = QueryEngine(index_dir, num_scorers=num_scorers)
        try:
            for query in ("castle museum river", "chocolate festival",
                          "wine cellar market student university"):
                w = engine.search_bm25(query, k=10)
                m = engine.search_bm25(query, k=10, algo="maxscore")
                assert w == m and len(w) > 0
        finally:
            engine.shutdown()
