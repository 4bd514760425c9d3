"""Phrase + boolean retrieval conformance.

Truth model: the session ``prepared`` fixture's vendored oracle index
(post df<=5 prune, url words prepended) supplies per-term posting
sets; phrase truth is "the phrase's stems occur consecutively in the
document TEXT's token stream" (the documented semantics of
``QueryEngine.search_phrase``), intersected with the pruned posting
sets — a slot stem the prune removed makes the phrase unservable.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from modernsearchengines_ray.functions.phrase import (
    boolean_doc_ids,
    contains_consecutive,
    intersect_doc_ids,
    ordered_chain_docs,
    positions_by_doc,
    sum_scores_for_docs,
)
from modernsearchengines_ray.functions.tokenizer import tokenize


def stems(text: str) -> list[str]:
    return [t for t, _ in tokenize(text.lower())]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

class TestKernels:
    def test_contains_consecutive(self):
        s = ["a", "b", "c", "b", "a"]
        assert contains_consecutive(s, ["b", "c"])
        assert contains_consecutive(s, ["c", "b", "a"])
        assert contains_consecutive(s, ["a"])
        assert not contains_consecutive(s, ["a", "c"])
        assert not contains_consecutive(s, ["b", "a", "c"])
        assert not contains_consecutive(s, [])
        assert not contains_consecutive([], ["a"])
        assert not contains_consecutive(["a"], ["a", "a"])

    def test_positions_by_doc_segmented_unsorted(self):
        # two segments: [5, 9] + [2, 7] — globally unsorted doc ids
        doc_ids = np.array([5, 9, 2, 7], dtype=np.int64)
        counts = np.array([2, 1, 3, 1], dtype=np.int64)
        flat = np.array([10, 20, 30, 40, 50, 60, 70], dtype=np.int64)
        got = positions_by_doc(doc_ids, counts, flat,
                               np.array([2, 5, 6, 9], dtype=np.int64))
        assert got[0].tolist() == [40, 50, 60]   # doc 2
        assert got[1].tolist() == [10, 20]       # doc 5
        assert got[2].tolist() == []             # doc 6 absent
        assert got[3].tolist() == [30]           # doc 9

    def test_ordered_chain(self):
        cands = np.array([1, 2, 3, 4], dtype=np.int64)
        slot_a = [np.array([5, 40]), np.array([50]),
                  np.array([10]), np.array([7])]
        slot_b = [np.array([12]), np.array([8]),
                  np.array([10]), np.array([9, 30])]
        got = ordered_chain_docs(cands, [slot_a, slot_b])
        # doc1: 5<12 ok; doc2: 50>8 no; doc3: 10<10 not strict; doc4: 7<9 ok
        assert got.tolist() == [1, 4]
        # gap bound: doc1 chain 5->12 gap 7
        got = ordered_chain_docs(cands, [slot_a, slot_b], max_gap=3)
        assert got.tolist() == [4]

    def test_ordered_chain_repeated_stem(self):
        # same positions array in both slots (repeated word) — needs
        # two distinct occurrences
        single = [np.array([4])]
        double = [np.array([4, 9])]
        assert ordered_chain_docs(
            np.array([0]), [single, single]).size == 0
        assert ordered_chain_docs(
            np.array([0]), [double, double]).tolist() == [0]

    def test_three_slot_chain_order_matters(self):
        # a<b exists and b<c exists, but only via different b's
        slots = [[np.array([10])], [np.array([5, 12])], [np.array([11])]]
        assert ordered_chain_docs(np.array([0]), slots).size == 0
        slots = [[np.array([10])], [np.array([5, 12])], [np.array([13])]]
        assert ordered_chain_docs(np.array([0]), slots).tolist() == [0]

    def test_boolean_doc_ids(self):
        a = np.array([1, 2, 3], dtype=np.int64)
        b = np.array([2, 3, 4], dtype=np.int64)
        c = np.array([3, 5], dtype=np.int64)
        assert boolean_doc_ids([[a], [b]], [], []).tolist() == [2, 3]
        assert boolean_doc_ids([[a, b]], [], []).tolist() == [2, 3]
        assert boolean_doc_ids([[a]], [], [c]).tolist() == [1, 2]
        assert boolean_doc_ids([], [a, c], []).tolist() == [1, 2, 3, 5]
        assert boolean_doc_ids([], [], [c]).size == 0
        empty = np.empty(0, dtype=np.int64)
        assert boolean_doc_ids([[a], [empty]], [], []).size == 0

    def test_intersect_and_scores(self):
        a = np.array([3, 1, 2], dtype=np.int64)     # unsorted ok
        b = np.array([2, 3], dtype=np.int64)
        cands = intersect_doc_ids([a, b])
        assert cands.tolist() == [2, 3]
        totals = sum_scores_for_docs(
            cands,
            [(a, np.array([30.0, 10.0, 20.0])), (b, np.array([1.0, 2.0]))],
        )
        assert totals.tolist() == [21.0, 32.0]


# ---------------------------------------------------------------------------
# engine conformance on the prepared fixture index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def engine(prepared):
    from modernsearchengines_ray.pipelines.query import QueryEngine

    _, index_dir, _, _ = prepared
    eng = QueryEngine(index_dir, num_scorers=2)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def docstore(prepared, ray_session, tmp_path_factory):
    import ray.data as rd

    from modernsearchengines_ray.state.docstore import (DocStore,
                                                        write_docstore)

    corpus_df, _, _, _ = prepared
    store = str(tmp_path_factory.mktemp("store") / "docs")
    write_docstore(rd.from_pandas(corpus_df[["doc_id", "url", "text"]]),
                   store, num_partitions=8)
    return DocStore(store, num_partitions=8)


def oracle_docs(oracle_index, stem: str) -> set[int]:
    return set(oracle_index.index.get(stem, {}))


def oracle_boolean(oracle_index, must, should, must_not):
    must_stems = [g for g in (stems(c) for c in must) if g]
    should_stems = [s for c in should for s in stems(c)]
    not_stems = [s for c in must_not for s in stems(c)]
    if must_stems:
        cands: set[int] | None = None
        for g in must_stems:
            for s in g:
                d = oracle_docs(oracle_index, s)
                cands = d if cands is None else cands & d
        cands = cands or set()
    elif should_stems:
        cands = set()
        for s in should_stems:
            cands |= oracle_docs(oracle_index, s)
    else:
        cands = set()
    for s in not_stems:
        cands -= oracle_docs(oracle_index, s)
    score_stems = list(dict.fromkeys(
        [s for g in must_stems for s in g] + should_stems))
    scored = []
    for d in sorted(cands):
        total = sum(oracle_index.index[s][d][0] for s in score_stems
                    if d in oracle_index.index.get(s, {}))
        scored.append((d, total))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored


def pick_terms(oracle_index, n=6) -> list[str]:
    """Most-frequent surviving stems — guaranteed df > 5."""
    by_df = sorted(oracle_index.index.items(),
                   key=lambda kv: (-len(kv[1]), kv[0]))
    return [t for t, _ in by_df[:n]]


class TestBooleanEngine:
    def assert_matches(self, engine, oracle_index, must=(), should=(),
                       must_not=()):
        got = engine.search_boolean(must=must, should=should,
                                    must_not=must_not, k=10_000)
        want = oracle_boolean(oracle_index, must, should, must_not)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    def test_must_conjunction(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        self.assert_matches(engine, oracle_index, must=(t[0], t[1]))
        assert engine.search_boolean(must=(t[0], t[1]), k=10_000)

    def test_must_not(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        self.assert_matches(engine, oracle_index, must=(t[0],),
                            must_not=(t[2],))

    def test_should_union(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        self.assert_matches(engine, oracle_index, should=(t[3], t[4]))

    def test_multi_word_must_clause(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        self.assert_matches(engine, oracle_index,
                            must=(f"{t[0]} {t[1]}",), must_not=(t[5],))

    def test_missing_term_empties_must(self, engine, prepared):
        assert engine.search_boolean(must=("zzzqqqxyzzy",)) == []
        t = pick_terms(prepared[3])
        assert engine.search_boolean(must=(t[0], "zzzqqqxyzzy")) == []

    def test_stopword_clause_ignored(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        got = engine.search_boolean(must=(t[0], "the"), k=10_000)
        want = engine.search_boolean(must=(t[0],), k=10_000)
        assert got == want

    def test_empty_query(self, engine):
        assert engine.search_boolean() == []
        assert engine.search_boolean(must_not=("castle",)) == []

    def test_k_truncates(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)
        full = engine.search_boolean(should=(t[0],), k=10_000)
        assert engine.search_boolean(should=(t[0],), k=3) == full[:3]


class TestFacetCounts:
    @pytest.fixture(scope="class")
    def meta_store(self, prepared, ray_session, tmp_path_factory):
        import ray.data as rd

        from modernsearchengines_ray.state.docstore import (DocStore,
                                                            write_docstore)

        corpus_df, _, _, _ = prepared
        store = str(tmp_path_factory.mktemp("facets") / "meta")
        write_docstore(rd.from_pandas(corpus_df[["doc_id", "lang", "site"]]),
                       store, num_partitions=8)
        return DocStore(store, num_partitions=8), corpus_df

    def test_query_facets_match_pandas(self, engine, meta_store):
        store, corpus_df = meta_store
        n = len(corpus_df)
        hits = engine.search_boolean(must=("castle",), k=n)
        ids = {d for d, _ in hits}
        assert 0 < len(ids) < n, "facet fixture query must discriminate"
        got = engine.facet_counts(store, "site", must=("castle",))
        want = (corpus_df[corpus_df["doc_id"].isin(ids)]["site"]
                .value_counts())
        assert dict(zip(got["site"], got["count"])) == want.to_dict()
        # sorted by (-count, value)
        assert got["count"].is_monotonic_decreasing or len(got) <= 1

    def test_whole_store_facets(self, engine, meta_store):
        store, corpus_df = meta_store
        got = engine.facet_counts(store, "lang")
        assert dict(zip(got["lang"], got["count"])) == \
            corpus_df["lang"].value_counts().to_dict()
        assert int(got["count"].sum()) == len(corpus_df)

    def test_no_match_facets_empty(self, engine, meta_store):
        store, _ = meta_store
        got = engine.facet_counts(store, "site",
                                  must=("zzzzunindexedzzzz",))
        assert list(got.columns) == ["site", "count"]
        assert len(got) == 0


class TestMoreLikeThis:
    def _truth(self, corpus_df, oracle_index, doc_id, k=5,
               max_query_terms=25):
        from modernsearchengines_ray.functions.bm25 import idf as idf_fn

        text = corpus_df.set_index("doc_id").loc[doc_id, "text"]
        counts = Counter(stems(text))
        mined = sorted(
            ((counts[t] * idf_fn(oracle_index.num_documents,
                                 len(oracle_index.index[t])), t)
             for t in counts if t in oracle_index.index),
            key=lambda x: (-x[0], x[1]),
        )
        terms = [t for _, t in mined[:max_query_terms]]
        scored: dict[int, float] = {}
        for t in terms:
            for d, (bm25, _) in oracle_index.index[t].items():
                scored[d] = scored.get(d, 0.0) + bm25
        ranked = sorted(scored.items(), key=lambda x: (-x[1], x[0]))
        return [h for h in ranked if h[0] != doc_id][:k]

    def test_matches_oracle_mining(self, engine, prepared, docstore):
        corpus_df, _, _, oracle_index = prepared
        for doc_id in corpus_df["doc_id"].iloc[[0, 7, 42]]:
            got = engine.more_like_this(int(doc_id), docstore, k=5)
            want = self._truth(corpus_df, oracle_index, int(doc_id), k=5)
            assert [d for d, _ in got] == [d for d, _ in want]
            for (_, gs), (_, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-9)
            assert all(d != int(doc_id) for d, _ in got)
            assert got, "MLT should find neighbours in the fixture"

    def test_max_query_terms_narrows(self, engine, prepared, docstore):
        corpus_df, _, _, oracle_index = prepared
        doc_id = int(corpus_df["doc_id"].iloc[3])
        got = engine.more_like_this(doc_id, docstore, k=5,
                                    max_query_terms=3)
        want = self._truth(corpus_df, oracle_index, doc_id, k=5,
                           max_query_terms=3)
        assert [d for d, _ in got] == [d for d, _ in want]

    def test_missing_doc_returns_empty(self, engine, docstore):
        assert engine.more_like_this(10**9, docstore, k=5) == []


def text_stream_matches(corpus_df, slots) -> set[int]:
    out = set()
    for r in corpus_df.itertuples():
        if contains_consecutive(stems(r.text), slots):
            out.add(int(r.doc_id))
    return out


def find_bigram(corpus_df, oracle_index, adjacent: bool):
    """A (stem_a, stem_b) pair, both surviving the df prune, that does
    (or does not) occur adjacently in some document text."""
    surviving = set(oracle_index.index)
    adj = Counter()
    cooc = Counter()
    for r in corpus_df.itertuples():
        s = stems(r.text)
        present = set(s) & surviving
        for x, y in zip(s, s[1:]):
            if x in surviving and y in surviving and x != y:
                adj[(x, y)] += 1
        for x in present:
            for y in present:
                if x != y:
                    cooc[(x, y)] += 1
    if adjacent:
        pair = max(sorted(adj), key=lambda p: (adj[p], p))
        return pair
    candidates = [p for p in sorted(cooc) if p not in adj]
    assert candidates, "fixture has every co-occurring pair adjacent?"
    return max(candidates, key=lambda p: (cooc[p], p))


class TestPhraseEngine:
    def test_exact_with_docstore(self, engine, prepared, docstore):
        corpus_df, _, _, oracle_index = prepared
        a, b = find_bigram(corpus_df, oracle_index, adjacent=True)
        slots = [a, b]
        want = text_stream_matches(corpus_df, slots)
        for s in slots:
            want &= oracle_docs(oracle_index, s)
        assert want, "fixture should contain the chosen bigram"
        got = engine.search_phrase(f"{a} {b}", k=10_000, docstore=docstore)
        assert {d for d, _ in got} == want
        # ranked by (-score, doc_id), score = sum of slot bm25
        for d, s in got:
            expect = sum(oracle_index.index[t][d][0] for t in {a, b})
            assert s == pytest.approx(expect, rel=1e-9)
        assert [d for d, _ in got] == [
            d for d, _ in sorted(got, key=lambda x: (-x[1], x[0]))]

    def test_index_only_is_superset(self, engine, prepared):
        corpus_df, _, _, oracle_index = prepared
        a, b = find_bigram(corpus_df, oracle_index, adjacent=True)
        want = text_stream_matches(corpus_df, [a, b])
        for s in (a, b):
            want &= oracle_docs(oracle_index, s)
        got = {d for d, _ in engine.search_phrase(f"{a} {b}", k=10_000)}
        assert got >= want

    def test_non_adjacent_pair_rejected(self, engine, prepared, docstore):
        corpus_df, _, _, oracle_index = prepared
        a, b = find_bigram(corpus_df, oracle_index, adjacent=False)
        got = engine.search_phrase(f"{a} {b}", k=10_000, docstore=docstore)
        want = text_stream_matches(corpus_df, [a, b])
        for s in (a, b):
            want &= oracle_docs(oracle_index, s)
        assert {d for d, _ in got} == want == set()

    def test_stopword_gaps_out_of_query(self, engine, prepared, docstore):
        corpus_df, _, _, oracle_index = prepared
        a, b = find_bigram(corpus_df, oracle_index, adjacent=True)
        plain = engine.search_phrase(f"{a} {b}", k=10_000,
                                     docstore=docstore)
        gapped = engine.search_phrase(f"{a} the {b}", k=10_000,
                                      docstore=docstore)
        assert gapped == plain

    def test_single_word_phrase(self, engine, prepared):
        oracle_index = prepared[3]
        t = pick_terms(oracle_index)[0]
        got = engine.search_phrase(t, k=10_000)
        assert {d for d, _ in got} == oracle_docs(oracle_index, t)

    def test_absent_and_empty(self, engine):
        assert engine.search_phrase("zzzqqqxyzzy castle") == []
        assert engine.search_phrase("the and of") == []
        assert engine.search_phrase("") == []

    def test_tombstoned_doc_excluded(self, engine, prepared, docstore,
                                     tmp_path):
        """Deletes drop phrase hits: rebuild a tiny index on 3 docs,
        tombstone a matching doc, expect it gone from the phrase and
        boolean results (decode-time live-docs filter)."""
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.delete import delete_docs
        from modernsearchengines_ray.pipelines.query import QueryEngine

        base = "castle river market museum garden bridge student"
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "url": [""] * 7,
            "text": [f"{base} extra{i} castle river" for i in range(7)],
        })
        idx = str(tmp_path / "idx")
        build_index(rd.from_pandas(docs), idx,
                    cfg=IndexConfig(prepend_url_words=False, num_shards=4),
                    corpus_id="phrase-del")
        eng = QueryEngine(idx, num_scorers=2)
        try:
            before = {d for d, _ in eng.search_phrase("castle river",
                                                      k=100)}
            assert before == {0, 1, 2, 3, 4, 5, 6}
            delete_docs(idx, [3], batch_id="t")
            eng.refresh_deletes()
            after = {d for d, _ in eng.search_phrase("castle river", k=100)}
            assert after == before - {3}
            got = {d for d, _ in eng.search_boolean(must=("castle",
                                                          "river"),
                                                    k=100)}
            assert got == before - {3}
        finally:
            eng.shutdown()
