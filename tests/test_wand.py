"""Block-max WAND kernel + distributed BM25 top-k exactness."""

from __future__ import annotations

import numpy as np
import pytest


def _make_lists(rng, n_terms=6, n_docs=4000, block_size=32):
    """Synthetic zipf-ish posting lists in the decoded-row shape."""
    rows = []
    for t in range(n_terms):
        df = int(rng.randint(50, n_docs // 2))
        doc_ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        scores = rng.gamma(2.0, 1.0 + t, size=df)
        # single segment per row here; segment logic covered separately
        n_blocks = (df + block_size - 1) // block_size
        block_first = doc_ids[::block_size]
        block_max = np.array([
            scores[i * block_size : (i + 1) * block_size].max()
            for i in range(n_blocks)
        ])
        rows.append({
            "doc_ids": doc_ids,
            "bm25": scores,
            "seg_lens": [df],
            "block_first_doc": block_first,
            "block_max_bm25": block_max,
        })
    return rows


def _brute_topk(rows, k):
    acc: dict[int, float] = {}
    for row in rows:
        for d, s in zip(row["doc_ids"].tolist(), row["bm25"].tolist()):
            acc[d] = acc.get(d, 0.0) + s
    order = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]
    return order


class TestWandKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_exact_vs_brute_force(self, seed):
        from modernsearchengines_ray.functions.wand import (
            make_cursors,
            wand_topk,
        )

        rng = np.random.RandomState(seed)
        rows = _make_lists(rng)
        cursors = make_cursors(rows, block_size=32)
        hits, stats = wand_topk(cursors, k=10)
        want = _brute_topk(rows, 10)
        assert [(d, round(s, 9)) for d, s in hits] == \
            [(d, round(s, 9)) for d, s in want]

    def test_pruning_fires(self):
        from modernsearchengines_ray.functions.wand import (
            make_cursors,
            wand_topk,
        )

        rng = np.random.RandomState(7)
        rows = _make_lists(rng, n_terms=4, n_docs=20000)
        cursors = make_cursors(rows, block_size=32)
        hits, stats = wand_topk(cursors, k=5)
        total_postings = sum(len(r["doc_ids"]) for r in rows)
        assert stats["block_skips"] > 0
        assert stats["scored"] < total_postings  # pruned some work

    def test_segmented_rows(self):
        """A row split into sorted segments scores identically."""
        from modernsearchengines_ray.functions.wand import (
            make_cursors,
            wand_topk,
        )

        rng = np.random.RandomState(5)
        rows = _make_lists(rng, n_terms=3)
        # split each row's list into two interleaved sorted segments
        seg_rows = []
        for row in rows:
            mask = rng.rand(len(row["doc_ids"])) < 0.5
            parts = []
            for m in (mask, ~mask):
                ids, sc = row["doc_ids"][m], row["bm25"][m]
                bs = 32
                nb = (len(ids) + bs - 1) // bs
                parts.append((ids, sc, ids[::bs], np.array([
                    sc[i * bs : (i + 1) * bs].max() for i in range(nb)
                ])))
            seg_rows.append({
                "doc_ids": np.concatenate([p[0] for p in parts]),
                "bm25": np.concatenate([p[1] for p in parts]),
                "seg_lens": [len(p[0]) for p in parts],
                "block_first_doc": np.concatenate([p[2] for p in parts]),
                "block_max_bm25": np.concatenate([p[3] for p in parts]),
            })
        flat, _ = wand_topk(make_cursors(rows, 32), k=10)
        seg, _ = wand_topk(make_cursors(seg_rows, 32), k=10)
        assert [(d, round(s, 9)) for d, s in flat] == \
            [(d, round(s, 9)) for d, s in seg]


class TestSearchBm25:
    @pytest.mark.parametrize("num_scorers", [1, 2, 3])
    def test_exact_vs_exhaustive_index_scan(self, prepared, num_scorers):
        from modernsearchengines_ray.functions.tokenizer import tokenize
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.shards import load_index_postings

        _, index_dir, _, _ = prepared
        postings = load_index_postings(index_dir)
        engine = QueryEngine(index_dir, num_scorers=num_scorers)
        try:
            for query in ("castle museum river", "chocolate festival",
                          "wine cellar market student university"):
                terms = sorted({t for t, _ in tokenize(query.lower())})
                acc: dict[int, float] = {}
                for t in terms:
                    for d, (s, _) in postings.get(t, {}).items():
                        acc[d] = acc.get(d, 0.0) + s
                want = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:10]
                got = engine.search_bm25(query, k=10)
                assert [d for d, _ in got] == [d for d, _ in want], query
                np.testing.assert_allclose(
                    [s for _, s in got], [s for _, s in want], atol=1e-9
                )
        finally:
            engine.shutdown()


class TestSearchAfter:
    """Cursor pagination (search_after): stitched pages must equal
    the one-shot top-k exactly — same docs, same scores, no dup or
    gap across the page boundary."""

    @pytest.mark.parametrize("num_scorers", [1, 3])
    def test_pages_stitch_to_topk(self, prepared, num_scorers):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _, index_dir, _, _ = prepared
        engine = QueryEngine(index_dir, num_scorers=num_scorers)
        try:
            query = "castle museum river"
            want = engine.search_bm25(query, k=12)
            page1 = engine.search_after(query, k=4)
            assert page1 == want[:4]
            page2 = engine.search_after(query, k=4, after=page1[-1])
            assert page2 == want[4:8]
            page3 = engine.search_after(query, k=4, after=page2[-1])
            assert page3 == want[8:12]
        finally:
            engine.shutdown()

    def test_cursor_past_end_returns_empty(self, prepared):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _, index_dir, _, _ = prepared
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            query = "chocolate festival"
            all_hits = engine.search_after(query, k=10_000)
            tail = engine.search_after(query, k=5,
                                       after=all_hits[-1])
            assert tail == []
        finally:
            engine.shutdown()


class TestTputAtWidth:
    """VERDICT r2 #10: the two-round TPUT merge's fill path sees little
    traffic at 8 shards / 2 scorers — pin exactness at real width
    (64 shards, 8 scorers, sf0.1's 5000 docs) where candidates
    routinely miss a scorer's phase-2 partial and must be filled."""

    @pytest.fixture(scope="class")
    def wide_index(self, ray_session, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index

        sf = "/root/testdata/sf0.1"
        schema = pq.read_schema(f"{sf}/documents.parquet").remove_metadata()
        ds = rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"],
            schema=pa.schema([schema.field("doc_id"),
                              schema.field("text")]))
        tmp = tmp_path_factory.mktemp("wide_idx")
        cfg = IndexConfig(prepend_url_words=False, num_shards=64)
        build_index(ds, str(tmp), cfg=cfg, corpus_id="wide")
        return str(tmp)

    def test_exact_at_64_shards_8_scorers(self, wide_index):
        from modernsearchengines_ray.functions.tokenizer import tokenize
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.shards import load_index_postings

        postings = load_index_postings(wide_index)
        engine = QueryEngine(wide_index, num_scorers=8)
        multi_scorer_queries = 0
        try:
            for query in ("stream data query", "join merge sort",
                          "window batch hash filter group",
                          "vector column row table scan"):
                terms = sorted({t for t, _ in tokenize(query.lower())})
                owners = {engine._owner(t) for t in terms
                          if engine._owner(t) is not None}
                if len(owners) > 1:
                    multi_scorer_queries += 1
                acc: dict[int, float] = {}
                for t in terms:
                    for d, (s, _) in postings.get(t, {}).items():
                        acc[d] = acc.get(d, 0.0) + s
                want = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:10]
                got = engine.search_bm25(query, k=10)
                assert [d for d, _ in got] == [d for d, _ in want], query
                np.testing.assert_allclose(
                    [s for _, s in got], [s for _, s in want], atol=1e-9
                )
        finally:
            engine.shutdown()
        # the point of the test: the cross-scorer merge must actually run
        assert multi_scorer_queries >= 3
