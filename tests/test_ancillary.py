"""Ancillary reference capabilities: snippets (M21), spellcheck (M17),
topics (T4/A13-A14), doc store (S6/J2/J3), batch retrieval (S7/S8)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestSnippet:
    def test_argmax_sentence(self):
        from modernsearchengines_ray.functions.snippet import (
            get_relevant_snippet,
        )

        doc = (
            "The weather is nice today. "
            "The castle museum opens at ten and shows medieval prints. "
            "Parking is available nearby."
        )
        snippet = get_relevant_snippet("castle museum medieval", doc)
        assert snippet == "The castle museum opens at ten and shows medieval prints."

    def test_single_sentence_returned_directly(self):
        from modernsearchengines_ray.functions.snippet import (
            get_relevant_snippet,
        )

        assert get_relevant_snippet("anything", "Just one sentence") == \
            "Just one sentence"

    def test_empty_document(self):
        from modernsearchengines_ray.functions.snippet import (
            get_relevant_snippet,
        )

        assert get_relevant_snippet("q", "") == "Document not found."


class TestSpellcheck:
    def test_known_word_unchanged(self):
        from modernsearchengines_ray.functions.spellcheck import SpellChecker

        sp = SpellChecker({"castle": 10, "river": 5})
        assert sp.correction("castle") == "castle"

    def test_edit1_correction_by_frequency(self):
        from modernsearchengines_ray.functions.spellcheck import SpellChecker

        sp = SpellChecker({"castle": 10, "cattle": 3})
        assert sp.correction("castl") == "castle"

    def test_edit2_fallback_and_unknown_passthrough(self):
        from modernsearchengines_ray.functions.spellcheck import SpellChecker

        sp = SpellChecker({"castle": 10})
        assert sp.correction("castlxy") == "castle"      # distance 2
        assert sp.correction("zzzzzzz") == "zzzzzzz"     # no candidate

    def test_whitelist(self):
        from modernsearchengines_ray.functions.spellcheck import SpellChecker

        sp = SpellChecker({})
        assert sp.correction("tübingen") == "tübingen"
        assert sp.correct_query("tuebingen castle") == "tuebingen castle"

    def test_from_index(self, prepared):
        from modernsearchengines_ray.functions.spellcheck import SpellChecker

        _, index_dir, _, _ = prepared
        sp = SpellChecker.from_index(index_dir)
        assert len(sp.freq) > 10
        # a corpus stem survives a one-letter typo
        stem = max(sp.freq, key=lambda t: (sp.freq[t], t))
        assert sp.correction(stem + "q") == stem


class TestTopics:
    def test_assign_shapes_and_determinism(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.topics import assign_topics
        from tests.fixtures import make_pages

        pages = make_pages(n=120, seed=11)
        df = pd.DataFrame({
            "doc_id": range(pages.num_rows),
            "text": pages["text"].to_pylist(),
        })
        out1 = assign_topics(rd.from_pandas(df), n_components=5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        out2 = assign_topics(rd.from_pandas(df), n_components=5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out1) == len(df)
        assert all(len(t) == 3 for t in out1["topics"])
        assert all(0 <= i < 5 for t in out1["topics"] for i in t)
        pd.testing.assert_frame_equal(out1, out2)   # seeded => identical

    def test_lda_recovers_planted_structure(self):
        from modernsearchengines_ray.stages.topics import TopicModel

        rng = np.random.RandomState(0)
        cats = {
            0: "apple banana fruit juice orange sweet".split(),
            1: "engine wheel brake road drive motor".split(),
        }
        docs, labels = [], []
        for _ in range(60):
            c = int(rng.randint(2))
            docs.append(" ".join(rng.choice(cats[c], size=30)))
            labels.append(c)
        model = TopicModel.fit(docs, n_components=2, seed=1)
        tops = [t[0] for t in model.assign(docs)]
        # top topic must separate the two vocabularies (up to label swap)
        agree = sum(int(t == l) for t, l in zip(tops, labels))
        assert max(agree, len(docs) - agree) >= 55

    def test_topic_top_words_partition_and_order(self):
        """K7 (topic.py:87-106): every vocab word belongs to exactly one
        topic (argmax partition) and words sort by weight descending."""
        import numpy as np

        from modernsearchengines_ray.stages.topics import (
            TfidfModel,
            TopicModel,
            topic_top_words,
        )

        docs = [
            "castle river museum bridge castle tour ticket entrance",
            "restaurant menu dish taste kitchen dinner lunch dish",
            "castle museum history medieval manuscript press history",
            "restaurant kitchen dinner wine cellar taste menu",
            "river bridge boat punt tower church street river",
            "museum manuscript book print seminar physics research",
        ] * 3
        model = TopicModel.fit(docs, n_components=3, seed=42)
        words = topic_top_words(model.tfidf, model.lda, num_words=5)
        assert set(words) == {0, 1, 2}
        flat = [w for ws in words.values() for w in ws]
        assert len(flat) == len(set(flat))       # argmax partition: no word twice
        for t, ws in words.items():
            weights = [model.lda.components[t, model.tfidf.vocab[w]]
                       for w in ws]
            assert weights == sorted(weights, reverse=True)
        # deterministic across fits
        again = topic_top_words(model.tfidf, model.lda, num_words=5)
        assert again == words

    def test_descriptor_mapping(self):
        from modernsearchengines_ray.stages.topics import (
            TOPIC_DESCRIPTORS,
            TopicAssign,
            TopicModel,
        )
        import pyarrow as pa

        model = TopicModel.fit(["castle river market"] * 5 +
                               ["engine brake road"] * 5, n_components=2)
        fn = TopicAssign(model)
        out = fn(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["castle river"], pa.string()),
        }))
        descs = out["topic_descriptors"][0].as_py()
        assert descs[0] in set(TOPIC_DESCRIPTORS.values())


class TestDocStore:
    def test_roundtrip_and_partition_pruning(self, ray_session, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.state.docstore import (
            DocStore,
            write_docstore,
        )

        df = pd.DataFrame({
            "doc_id": range(100),
            "url": [f"https://x{i}.example.com" for i in range(100)],
            "text": [f"text {i}" for i in range(100)],
        })
        store = str(tmp_path / "store")
        write_docstore(rd.from_pandas(df), store, num_partitions=8)
        ds = DocStore(store, num_partitions=8)
        got = ds.lookup_map([3, 97, 42], columns=["url", "text"])
        assert set(got) == {3, 97, 42}
        assert got[42]["url"] == "https://x42.example.com"
        assert got[42]["text"] == "text 42"

    def test_compact_docstore_drops_deleted(self, ray_session, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.state.docstore import (
            DocStore,
            compact_docstore,
            write_docstore,
        )

        df = pd.DataFrame({
            "doc_id": range(100),
            "url": [f"https://x{i}.example.com" for i in range(100)],
            "text": [f"text {i}" for i in range(100)],
        })
        store = str(tmp_path / "store")
        write_docstore(rd.from_pandas(df), store, num_partitions=8)

        dropped = compact_docstore(store, [3, 42, 97, 12345],
                                   num_partitions=8)
        assert dropped == 3  # the ghost id is a no-op
        ds = DocStore(store, num_partitions=8)
        assert ds.lookup_map([3, 42, 97], columns=["url"]) == {}
        survivors = ds.lookup_map([2, 43, 96], columns=["url"])
        assert set(survivors) == {2, 43, 96}
        # idempotent re-run
        assert compact_docstore(store, [3, 42, 97],
                                num_partitions=8) == 0

    def test_empty_lookup(self, ray_session, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.state.docstore import (
            DocStore,
            write_docstore,
        )

        df = pd.DataFrame({"doc_id": [1], "url": ["u"], "text": ["t"]})
        store = str(tmp_path / "store")
        write_docstore(rd.from_pandas(df), store, num_partitions=4)
        assert DocStore(store, num_partitions=4).lookup_map([], ["url"]) == {}


class TestTermCache:
    def test_cached_and_uncached_results_identical(self, prepared):
        from fixtures import QUERIES

        from modernsearchengines_ray.pipelines.query import QueryEngine

        _corpus_df, index_dir, _result, _oi = prepared
        cached = QueryEngine(index_dir, num_scorers=2)
        uncached = QueryEngine(index_dir, num_scorers=2, term_cache_size=0)
        try:
            for _qid, q in QUERIES:
                first = cached.search(q)
                again = cached.search(q)          # cache-hit path
                cold = uncached.search(q)
                assert first == again == cold, q
        finally:
            cached.shutdown()
            uncached.shutdown()

    def test_cache_eviction_bounded(self, prepared):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _corpus_df, index_dir, _result, _oi = prepared
        engine = QueryEngine(index_dir, num_scorers=2, term_cache_size=4)
        try:
            engine.search("castle river market museum garden bridge "
                          "student library chocolate festival")
            assert len(engine._term_cache) <= 4
        finally:
            engine.shutdown()


class TestBatchRetrieval:
    def test_trec_output_matches_oracle(self, prepared, tmp_path):
        from modernsearchengines_ray.oracle import oracle_search
        from modernsearchengines_ray.pipelines.query import (
            run_batched_queries,
        )
        from tests.fixtures import QUERIES

        corpus_df, index_dir, _, oracle_index = prepared
        qpath = tmp_path / "queries.txt"
        qpath.write_text(
            "".join(f"{n}\t{q}\n" for n, q in QUERIES[:3])
        )
        out = run_batched_queries(str(qpath), index_dir,
                                  str(tmp_path / "batch_results.txt"),
                                  num_scorers=2)
        lines = open(out).read().splitlines()
        assert lines, "no output"
        for qnum, qtext in QUERIES[:3]:
            want = oracle_search(oracle_index, qtext)[:100]
            got = [l for l in lines if l.startswith(f"{qnum}\t")]
            assert len(got) == len(want)
            for rank, (line, (doc_id, score)) in enumerate(
                    zip(got, want), start=1):
                qn, rk, url, sc = line.split("\t")
                assert int(qn) == qnum and int(rk) == rank
                assert url == str(doc_id)
                assert sc == f"{score:.3f}"

    def test_search_full_with_docstore(self, prepared, tmp_path, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.docstore import (
            DocStore,
            write_docstore,
        )

        corpus_df, index_dir, _, _ = prepared
        store = str(tmp_path / "store")
        corpus_df = corpus_df.assign(site="")
        write_docstore(
            rd.from_pandas(corpus_df[["doc_id", "url", "site", "text"]]),
            store, num_partitions=8,
        )
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            rows = engine.search_full(
                "castle", DocStore(store, num_partitions=8), top_n=5
            )
        finally:
            engine.shutdown()
        assert 0 < len(rows) <= 5
        by_id = corpus_df.set_index("doc_id")
        for r in rows:
            assert r["url"] == by_id.loc[r["doc_id"], "url"]
            assert r["snippet"]                     # non-empty snippet
            assert r["snippet"] in by_id.loc[r["doc_id"], "text"]


class TestDistributedRankMerge:
    def test_distributed_merge_bit_identical(self, prepared):
        """VERDICT r2 #7: merge="distributed" (hash-partitioned ordered
        reduce over per-(term,doc) contribution rows) must reproduce the
        driver merge bit-exactly — same docs, same float scores — since
        the segmented reduce preserves the per-doc term addition order."""
        from fixtures import QUERIES

        from modernsearchengines_ray.pipelines.query import QueryEngine

        _corpus_df, index_dir, _result, _oi = prepared
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            for _qid, q in QUERIES[:4]:
                drv = engine.search(q, merge="driver")
                dist = engine.search(q, merge="distributed")
                assert drv == dist, q
        finally:
            engine.shutdown()

    def test_unknown_merge_mode_rejected(self, prepared):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _corpus_df, index_dir, _result, _oi = prepared
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            import pytest as _pytest

            with _pytest.raises(ValueError, match="merge"):
                engine.search("tuebingen castle", merge="bogus")
        finally:
            engine.shutdown()


class TestLazyShardScorer:
    def test_lazy_results_identical_and_row_groups_split(
            self, ray_session, pages_parquet, tmp_path):
        """lazy_shards=True over a row-group-granular index must return
        the exact same rankings as the eager scorer, touching row
        groups instead of whole shards."""
        import pyarrow.parquet as pq
        import ray.data as rd
        from fixtures import QUERIES

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.corpus_prep import (
            prepare_corpus,
        )
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.manifest import shard_path

        corpus_df = prepare_corpus(
            rd.read_parquet(pages_parquet),
            doc_id_mode="dense_rank").to_pandas()
        index_dir = str(tmp_path / "rg_idx")
        build_index(
            rd.from_pandas(corpus_df[["doc_id", "url", "text"]]),
            index_dir,
            cfg=IndexConfig(num_shards=4, shard_row_group_size=16),
            corpus_id="rg",
        )
        # the config actually split the shard files into row groups
        n_groups = pq.ParquetFile(shard_path(index_dir, 0)).num_row_groups
        assert n_groups > 1, "shard_row_group_size had no effect"

        eager = QueryEngine(index_dir, num_scorers=2)
        lazy = QueryEngine(index_dir, num_scorers=2, lazy_shards=True)
        try:
            for _qid, q in QUERIES[:4]:
                assert eager.search(q) == lazy.search(q), q
                assert eager.search_bm25(q, k=10) == \
                    lazy.search_bm25(q, k=10), q
            want = {q: lazy.search_bm25(q, k=10) for _x, q in QUERIES[:4]}
        finally:
            eager.shutdown()
            lazy.shutdown()

        # compaction honors the build's row-group granularity (reads
        # it from meta), so lazy serving economics survive and the
        # rankings stay identical
        from modernsearchengines_ray.pipelines.compact import compact_index

        compact_index(index_dir)
        assert pq.ParquetFile(shard_path(index_dir, 0)).num_row_groups > 1
        lazy2 = QueryEngine(index_dir, num_scorers=2, lazy_shards=True)
        try:
            for _qid, q in QUERIES[:4]:
                assert lazy2.search_bm25(q, k=10) == want[q], q
        finally:
            lazy2.shutdown()


class TestLocatorArrays:
    """VERDICT r4 #3: the scorer's term locator is one sorted array +
    two int arrays, not a per-term Python dict."""

    def test_vocab_heavy_locator_pins_no_dict(self, ray_session,
                                              prepared):
        from modernsearchengines_ray.pipelines.query import ShardScorer
        from modernsearchengines_ray.state.manifest import (
            read_manifests,
        )

        _corpus, index_dir, _res, _oracle = prepared
        shards = sorted(read_manifests(index_dir).keys())
        cls = ShardScorer.__ray_actor_class__
        sc = cls(index_dir, shards)

        # the former dict is gone; the locator is the array triple
        assert not hasattr(sc, "_loc")
        import numpy as np
        assert isinstance(sc._sorted_terms, np.ndarray)
        assert sc._sorted_ti.dtype == np.int32
        assert sc._sorted_ri.dtype == np.int64
        assert len(sc._sorted_terms) == len(sc._sorted_ti) \
            == len(sc._sorted_ri)
        # strictly sorted (terms unique across hash-partitioned shards)
        terms = sc._sorted_terms
        assert all(terms[i] < terms[i + 1]
                   for i in range(len(terms) - 1))
        # TermDict shares the SAME array object — zero extra copies
        assert sc._termdict.terms is sc._sorted_terms

        # lookup agrees with a brute-force reference over every term
        ref = {}
        for ti, tab in enumerate(sc._tables):
            for ri, t in enumerate(tab["term"].to_pylist()):
                ref[t] = (ti, ri)
        for t, want in ref.items():
            assert sc._lookup(t) == want
        assert sc._lookup("zz-not-a-term-zz") is None
        assert sc._lookup("") is None

    def test_empty_shard_list(self, ray_session, prepared):
        from modernsearchengines_ray.pipelines.query import ShardScorer

        _corpus, index_dir, _res, _oracle = prepared
        sc = ShardScorer.__ray_actor_class__(index_dir, [])
        assert len(sc._sorted_terms) == 0
        assert sc._lookup("anything") is None
