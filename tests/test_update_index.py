"""Incremental index update (pipelines.build_index.update_index).

The gate: updating a base index with a delta must be LOGICALLY
identical — same terms, df, idf, per-posting BM25 scores (bit-equal
floats) and positions — to a from-scratch build over the union corpus.
Shard bytes may differ (posting-list segment order follows run-file
order, doc-order-free by design), so equality is asserted on the
decoded ``load_index_postings`` shape plus the meta stats.
"""

from __future__ import annotations

import os

import pytest


def _split_corpus(pages_parquet):
    import ray.data as rd

    from modernsearchengines_ray.pipelines.corpus_prep import prepare_corpus

    corpus_df = prepare_corpus(rd.read_parquet(pages_parquet),
                               doc_id_mode="dense_rank").to_pandas()
    cols = corpus_df[["doc_id", "url", "text"]].reset_index(drop=True)
    cut = (2 * len(cols)) // 3
    return cols, cols.iloc[:cut], cols.iloc[cut:]


def _build(df, index_dir, corpus_id, **kw):
    import ray.data as rd

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import build_index

    return build_index(rd.from_pandas(df), index_dir,
                       cfg=IndexConfig(num_shards=8),
                       corpus_id=corpus_id, **kw)


def _update(df, index_dir, delta_id, **kw):
    import ray.data as rd

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import update_index

    return update_index(rd.from_pandas(df), index_dir, delta_id=delta_id,
                        cfg=IndexConfig(num_shards=8), **kw)


def _assert_same_logical_index(dir_a, dir_b):
    from modernsearchengines_ray.pipelines.build_index import read_meta
    from modernsearchengines_ray.state.shards import load_index_postings

    meta_a, meta_b = read_meta(dir_a), read_meta(dir_b)
    assert meta_a["num_documents"] == meta_b["num_documents"]
    assert meta_a["avg_doc_len"] == meta_b["avg_doc_len"]  # exact float
    assert meta_a["num_indexed"] == meta_b["num_indexed"]
    assert meta_a["char_sum"] == meta_b["char_sum"]

    a, b = load_index_postings(dir_a), load_index_postings(dir_b)
    assert set(a) == set(b)
    for term in a:
        assert a[term] == b[term], term  # doc_id -> (score, positions)


class TestUpdateIndex:
    def test_update_equals_rebuild(self, ray_session, pages_parquet,
                                   tmp_path):
        both, base, delta = _split_corpus(pages_parquet)

        incr = str(tmp_path / "incr")
        _build(base, incr, "base", keep_runs=True)
        result = _update(delta, incr, "d1")
        assert result.stats.num_documents == len(both)
        assert result.shards_built == 8

        full = str(tmp_path / "full")
        _build(both, full, "full")
        _assert_same_logical_index(incr, full)

    def test_chained_updates_and_idempotence(self, ray_session,
                                             pages_parquet, tmp_path):
        both, base, delta = _split_corpus(pages_parquet)
        half = len(delta) // 2
        d1, d2 = delta.iloc[:half], delta.iloc[half:]

        incr = str(tmp_path / "incr")
        _build(base, incr, "base", keep_runs=True)
        _update(d1, incr, "d1")
        second = _update(d2, incr, "d2", merge_salts=2)
        assert second.stats.num_documents == len(both)

        # replaying either delta is a no-op (spill + fingerprint reuse)
        replay = _update(d1, incr, "d1")
        assert replay.shards_built == 0
        assert replay.stats.num_documents == len(both)

        full = str(tmp_path / "full")
        _build(both, full, "full")
        _assert_same_logical_index(incr, full)

    def test_search_after_update_matches_rebuild(self, ray_session,
                                                 pages_parquet, tmp_path):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        both, base, delta = _split_corpus(pages_parquet)
        incr = str(tmp_path / "incr")
        _build(base, incr, "base", keep_runs=True)
        _update(delta, incr, "d1")
        full = str(tmp_path / "full")
        _build(both, full, "full")

        eng_i = QueryEngine(incr, num_scorers=2)
        eng_f = QueryEngine(full, num_scorers=2)
        for q in ["castle river", "tübingen museum", "food market old town"]:
            assert eng_i.search(q) == eng_f.search(q), q
            assert eng_i.search_bm25(q, k=10) == eng_f.search_bm25(q, k=10), q

    def test_update_requires_retained_runs(self, ray_session,
                                           pages_parquet, tmp_path):
        _, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "noruns")
        _build(base, idx, "base")  # keep_runs=False: runs deleted
        with pytest.raises(ValueError, match="keep_runs"):
            _update(delta, idx, "d1")

    def test_update_guards(self, ray_session, pages_parquet, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import update_index

        _, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "guard")
        _build(base, idx, "base", keep_runs=True)

        with pytest.raises(ValueError, match="delta_id"):
            _update(delta, idx, "")
        with pytest.raises(ValueError, match="num_shards"):
            update_index(rd.from_pandas(delta), idx, delta_id="d1",
                         cfg=IndexConfig(num_shards=4))
        with pytest.raises(ValueError, match="meta.json"):
            _update(delta, str(tmp_path / "absent"), "d1")

    def test_salted_update_bitwise_equal(self, ray_session, pages_parquet,
                                         tmp_path):
        """merge_salts on the update path reproduces the single-level
        update exactly (same shard parquet content)."""
        import pyarrow.parquet as pq

        _, base, delta = _split_corpus(pages_parquet)
        plain = str(tmp_path / "plain")
        salted = str(tmp_path / "salted")
        for d in (plain, salted):
            _build(base, d, "base", keep_runs=True)
        _update(delta, plain, "d1")
        _update(delta, salted, "d1", merge_salts=3)
        for k in range(8):
            a = pq.read_table(os.path.join(plain, f"shard={k}.parquet"))
            b = pq.read_table(os.path.join(salted, f"shard={k}.parquet"))
            assert a.equals(b), k


class TestCompactIndex:
    def test_compact_preserves_ranking_and_merges_segments(
            self, ray_session, pages_parquet, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from modernsearchengines_ray.functions.varint import (
            decode_grouped_deltas_np,
        )
        from modernsearchengines_ray.pipelines.compact import compact_index
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.shards import (
            list_shard_files,
            load_index_postings,
        )

        both, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(base, idx, "base", keep_runs=True)
        _update(delta, idx, "d1")

        before = load_index_postings(idx)
        multi_seg = 0
        for path in list_shard_files(idx):
            t = pq.read_table(path)
            multi_seg += sum(
                1 for i in range(t.num_rows)
                if len(t["seg_lens"][i].as_py()) > 1)
        assert multi_seg > 0  # update actually produced segmented terms

        eng = QueryEngine(idx, num_scorers=2)
        queries = ["castle river", "tübingen museum", "market old town"]
        want_full = {q: eng.search(q) for q in queries}
        want_topk = {q: eng.search_bm25(q, k=10) for q in queries}

        result = compact_index(idx)
        assert result["shards"] == 8

        after = load_index_postings(idx)
        assert set(after) == set(before)
        for term in before:
            assert after[term] == before[term], term

        for path in list_shard_files(idx):
            t = pq.read_table(path)
            for i in range(t.num_rows):
                seg_lens = t["seg_lens"][i].as_py()
                assert seg_lens == [t["df"][i].as_py()]
                doc_ids = decode_grouped_deltas_np(
                    t["doc_ids"][i].as_py(),
                    np.asarray(seg_lens, dtype=np.int64))
                assert (np.diff(doc_ids) > 0).all()

        eng2 = QueryEngine(idx, num_scorers=2)
        for q in queries:
            assert eng2.search(q) == want_full[q], q
            assert eng2.search_bm25(q, k=10) == want_topk[q], q


def _split_by_doc_id(pages_parquet, parts=2):
    """Contiguous doc_id-range splits — the partitioning shape
    merge_indexes' range check targets (iloc splits interleave ids)."""
    both, _, _ = _split_corpus(pages_parquet)
    both = both.sort_values("doc_id").reset_index(drop=True)
    cut = len(both) // parts
    return both, [both.iloc[i * cut: (i + 1) * cut if i < parts - 1
                            else len(both)] for i in range(parts)]


def _merge(base_dir, others, **kw):
    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import merge_indexes

    return merge_indexes(base_dir, others, cfg=IndexConfig(num_shards=8),
                         **kw)


class TestMergeIndexes:
    def test_merge_equals_rebuild(self, ray_session, pages_parquet,
                                  tmp_path):
        both, (base, delta) = _split_by_doc_id(pages_parquet)

        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        _build(base, a, "base", keep_runs=True)
        _build(delta, b, "delta", keep_runs=True)
        result = _merge(a, [b])
        assert result.stats.num_documents == len(both)
        assert result.shards_built == 8

        full = str(tmp_path / "full")
        _build(both, full, "full")
        _assert_same_logical_index(a, full)

        # re-merging the same source is a no-op (graft + fingerprints)
        replay = _merge(a, [b])
        assert replay.shards_built == 0
        assert replay.stats.num_documents == len(both)
        _assert_same_logical_index(a, full)

    def test_three_way_merge_then_update(self, ray_session, pages_parquet,
                                         tmp_path):
        """Per-partition parallel builds merged, then incrementally
        updated — the full composability chain — equals one build."""
        both, parts = _split_by_doc_id(pages_parquet, parts=3)
        upd_cut = len(parts[2]) // 2
        p3, extra = parts[2].iloc[:upd_cut], parts[2].iloc[upd_cut:]

        dirs = [str(tmp_path / f"p{i}") for i in range(3)]
        _build(parts[0], dirs[0], "p0", keep_runs=True)
        _build(parts[1], dirs[1], "p1", keep_runs=True)
        _build(p3, dirs[2], "p2", keep_runs=True)
        # exact id check reads the docstats ledger — must accept truly
        # disjoint sources (the range check is exercised elsewhere)
        merged = _merge(dirs[0], dirs[1:], merge_salts=2,
                        id_check="exact")
        assert merged.stats.num_documents == len(both) - len(extra)
        _update(extra, dirs[0], "extra")

        full = str(tmp_path / "full")
        _build(both, full, "full")
        _assert_same_logical_index(dirs[0], full)

    def test_merge_guards(self, ray_session, pages_parquet, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import \
            merge_indexes

        _, base, delta = _split_corpus(pages_parquet)
        a = str(tmp_path / "a")
        _build(base, a, "base", keep_runs=True)

        # shard-routing mismatch
        with pytest.raises(ValueError, match="num_shards"):
            merge_indexes(a, [], cfg=IndexConfig(num_shards=4))

        # source without retained runs
        noruns = str(tmp_path / "noruns")
        _build(delta, noruns, "delta")
        with pytest.raises(ValueError, match="keep_runs"):
            _merge(a, [noruns])

        # overlapping doc-id ranges (same corpus twice)
        dup = str(tmp_path / "dup")
        _build(base, dup, "base2", keep_runs=True)
        with pytest.raises(ValueError, match="overlap"):
            _merge(a, [dup])
        # exact mode pinpoints the real collision, not just the span
        with pytest.raises(ValueError, match="shares"):
            _merge(a, [dup], id_check="exact")
        with pytest.raises(ValueError, match="id_check"):
            _merge(a, [dup], id_check="bogus")
