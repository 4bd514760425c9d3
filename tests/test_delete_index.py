"""Document deletion (pipelines/delete.py + state/tombstones.py).

Two gates:
1. Tombstone serving filter — deleted docs never surface, k fills
   with live docs, survivors keep bit-equal scores (Lucene live-docs
   semantics; stats stale until purge).
2. Purge exactness — after ``purge_deletes`` the index is LOGICALLY
   IDENTICAL (terms, df, idf, bit-equal BM25 floats, positions, meta
   stats) to a from-scratch build over the remaining corpus.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_update_index import (
    _assert_same_logical_index,
    _build,
    _split_corpus,
    _update,
)


def _engine(index_dir, **kw):
    from modernsearchengines_ray.pipelines.query import QueryEngine

    return QueryEngine(index_dir, num_scorers=2, **kw)


QUERIES = ["castle river", "tübingen museum", "old market town",
           "university library"]


class TestTombstoneServing:
    def test_filter_and_refresh(self, ray_session, pages_parquet,
                                tmp_path):
        from modernsearchengines_ray.pipelines.delete import delete_docs

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True)

        eng = _engine(idx)
        before_topk = {q: eng.search_bm25(q, k=10) for q in QUERIES}
        victims = set()
        for q in QUERIES:
            victims.update(d for d, _ in before_topk[q][:3])
        assert victims

        delete_docs(idx, sorted(victims), batch_id="b1")
        # a running engine picks deletes up via refresh (new engines
        # read the ledger at construction)
        assert eng.refresh_deletes() == len(victims)

        for q in QUERIES:
            full = eng.search(q)
            topk = eng.search_bm25(q, k=10)
            assert not victims & {d for d, _ in full}, q
            assert not victims & {d for d, _ in topk}, q
            # k fills with live docs when enough remain
            live_before = [(d, s) for d, s in before_topk[q]
                           if d not in victims]
            assert len(topk) >= len(live_before)
            # survivors keep their exact scores and relative order:
            # WAND top-k of the filtered lists must agree with the
            # pre-delete ranking minus the victims
            assert topk[:len(live_before)] == live_before, q

        eng.shutdown()

    def test_positions_filtered_consistently(self, ray_session,
                                             pages_parquet, tmp_path):
        """Proximity scoring (which decodes positions) still works
        with tombstones in effect and excludes deleted docs."""
        from modernsearchengines_ray.pipelines.delete import delete_docs

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True)
        eng = _engine(idx)
        hits = eng.search("castle river old town")
        victims = [d for d, _ in hits[:2]]
        delete_docs(idx, victims, batch_id="b1")
        eng.refresh_deletes()
        after = eng.search("castle river old town")
        assert not set(victims) & {d for d, _ in after}
        eng.shutdown()


class TestPurge:
    def test_purge_equals_rebuild(self, ray_session, pages_parquet,
                                  tmp_path):
        from modernsearchengines_ray.pipelines.build_index import read_meta
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True)

        rng = np.random.default_rng(7)
        victims = sorted(
            rng.choice(corpus["doc_id"].to_numpy(), size=40,
                       replace=False).tolist())
        delete_docs(idx, victims, batch_id="b1")
        result = purge_deletes(idx)
        assert result["purged"] == 40
        assert result["shards_built"] == 8

        remaining = corpus[~corpus["doc_id"].isin(victims)]
        fresh = str(tmp_path / "fresh")
        _build(remaining, fresh, "fresh")
        _assert_same_logical_index(idx, fresh)
        assert read_meta(idx)["num_documents"] == len(remaining)

        # ledger cleared; serving needs no filter anymore
        from modernsearchengines_ray.state.tombstones import (
            read_tombstones,
        )
        assert len(read_tombstones(idx)) == 0

        # ranking identical to an engine over the fresh build
        e1, e2 = _engine(idx), _engine(fresh)
        for q in QUERIES:
            assert e1.search(q) == e2.search(q), q
            assert e1.search_bm25(q, k=10) == e2.search_bm25(q, k=10), q
        e1.shutdown()
        e2.shutdown()

    def test_purge_spans_base_and_deltas(self, ray_session,
                                         pages_parquet, tmp_path):
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        both, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(base, idx, "base", keep_runs=True)
        _update(delta, idx, "d1")

        victims = sorted(base["doc_id"].iloc[::7].tolist()
                         + delta["doc_id"].iloc[::5].tolist())
        delete_docs(idx, victims, batch_id="b1")
        result = purge_deletes(idx)
        assert result["purged"] == len(victims)

        remaining = both[~both["doc_id"].isin(victims)]
        fresh = str(tmp_path / "fresh")
        _build(remaining, fresh, "fresh")
        _assert_same_logical_index(idx, fresh)

    def test_purge_then_update_then_purge(self, ray_session,
                                          pages_parquet, tmp_path):
        """The full lifecycle chains: build -> delete+purge -> update
        -> delete+purge, staying logically exact throughout."""
        import pandas as pd

        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        both, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(base, idx, "base", keep_runs=True)

        v1 = sorted(base["doc_id"].iloc[::6].tolist())
        delete_docs(idx, v1, batch_id="b1")
        purge_deletes(idx)
        _update(delta, idx, "d1")
        v2 = sorted(delta["doc_id"].iloc[::4].tolist())
        delete_docs(idx, v2, batch_id="b2")
        purge_deletes(idx)

        remaining = pd.concat([
            base[~base["doc_id"].isin(v1)],
            delta[~delta["doc_id"].isin(v2)],
        ])
        fresh = str(tmp_path / "fresh")
        _build(remaining, fresh, "fresh")
        _assert_same_logical_index(idx, fresh)

    def test_purge_noop_and_unknown_ids(self, ray_session,
                                        pages_parquet, tmp_path):
        from modernsearchengines_ray.pipelines.build_index import read_meta
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True)
        meta_before = read_meta(idx)

        # empty ledger -> no-op
        assert purge_deletes(idx)["purged"] == 0

        # ids that never existed -> stats unchanged, ledger cleared
        delete_docs(idx, [10_000_000, 10_000_001], batch_id="ghost")
        result = purge_deletes(idx)
        assert result["purged"] == 0
        meta_after = read_meta(idx)
        assert meta_after["num_documents"] == meta_before["num_documents"]
        assert meta_after["char_sum"] == meta_before["char_sum"]

    def test_range_pruned_purge_touches_only_owning_files(
            self, ray_session, pages_parquet, tmp_path):
        """Deletes localized to one run file's doc range rewrite ONLY
        that file (the doc_ranges manifest prune) — and stay exact."""
        import os

        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )
        from modernsearchengines_ray.stages.spill import (
            read_segment,
            spill_manifest,
        )

        corpus, _, _ = _split_corpus(pages_parquet)
        # id-sorted ingest => disjoint per-file doc ranges (the layout
        # a crawler writing sequential ids produces)
        corpus = corpus.sort_values("doc_id").reset_index(drop=True)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True,
               tokenizer_batch_size=50)
        runs_dir = os.path.join(idx, "_runs")
        m = spill_manifest(runs_dir)
        n_files = len(m["doc_segments"])
        assert n_files > 2, "need multiple run files for this test"

        # victims physically inside ONE file (its docstats ledger);
        # ranges of other files may still overlap, so the expected
        # rewrite count is exactly 1 regardless of range overlap
        name, seg = sorted(m["doc_segments"].items())[0]
        victims = sorted(
            read_segment(runs_dir, name, seg)["doc_id"].to_pylist())[:5]
        assert victims
        delete_docs(idx, victims, batch_id="b1")
        expect_scanned = sum(
            1 for lo, hi in m["doc_ranges"].values()
            if any(lo <= v <= hi for v in victims))
        result = purge_deletes(idx)
        assert result["purged"] == len(victims)
        assert result["files_rewritten"] == 1
        # the doc_ranges prune skipped every file whose range can't
        # hold a victim
        assert result["files_scanned"] == expect_scanned < n_files

        remaining = corpus[~corpus["doc_id"].isin(victims)]
        fresh = str(tmp_path / "fresh")
        _build(remaining, fresh, "fresh", tokenizer_batch_size=50)
        _assert_same_logical_index(idx, fresh)

    def test_purge_crash_recovery(self, ray_session, pages_parquet,
                                  tmp_path, monkeypatch):
        """Crash between the spill-manifest swap and the shard
        re-merge: the re-run detects the manifests are ahead of meta
        (zero new deltas, same deterministic tag) and completes —
        still equal to the fresh rebuild."""
        from modernsearchengines_ray.pipelines import delete as delete_mod
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c", keep_runs=True)
        victims = sorted(corpus["doc_id"].iloc[::9].tolist())
        delete_docs(idx, victims, batch_id="b1")

        def boom(*a, **k):
            raise RuntimeError("injected crash before merge")

        monkeypatch.setattr(delete_mod, "_merge_shards", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            purge_deletes(idx)
        monkeypatch.undo()

        result = purge_deletes(idx)  # run files already purged
        assert result["purged"] == 0
        assert result["shards_built"] == 8

        remaining = corpus[~corpus["doc_id"].isin(victims)]
        fresh = str(tmp_path / "fresh")
        _build(remaining, fresh, "fresh")
        _assert_same_logical_index(idx, fresh)

    def test_upsert_flow(self, ray_session, pages_parquet, tmp_path):
        """Re-crawled URL: delete the old doc, update with the new
        version — equals a fresh build over the final corpus."""
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        both, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(base, idx, "base", keep_runs=True)

        # "re-crawl" 10 base pages: new content arrives under NEW
        # doc_ids (ids are immutable at this layer), old ids tombstone
        recrawled = base.iloc[:10].copy()
        max_id = int(both["doc_id"].max())
        recrawled["doc_id"] = np.arange(max_id + 1, max_id + 11)
        recrawled["text"] = recrawled["text"] + " updated revision"
        old_ids = base["doc_id"].iloc[:10].tolist()

        delete_docs(idx, old_ids, batch_id="recrawl")
        _update(recrawled, idx, "recrawl")
        purge_deletes(idx)

        import pandas as pd

        final = pd.concat([base.iloc[10:], recrawled])
        fresh = str(tmp_path / "fresh")
        _build(final, fresh, "fresh")
        _assert_same_logical_index(idx, fresh)
