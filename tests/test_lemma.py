"""M14 fidelity hook: spaCy-shaped lemma layer in the tokenizer.

The reference lemmatizes with spaCy between the stopword drop and the
Porter stem (/root/reference/indexing.py:148-159); the engine exposes
that position as ``lemma_table`` (identity by default).  These tests
pin (a) recorded golden token streams for the vendored irregular-forms
table, (b) default-path invariance, (c) end-to-end engine-vs-oracle
rank identity with the table ENABLED on both sides.
"""

from __future__ import annotations

import pandas as pd
import pytest

from modernsearchengines_ray.functions.lemma import (
    DEFAULT_LEMMA_TABLE,
    load_lemma_table,
)
from modernsearchengines_ray.functions.tokenizer import tokenize


def stems(text: str, table=None) -> list[str]:
    return [t for t, _ in tokenize(text, lemma_table=table)]


class TestGoldenStreams:
    def test_irregular_verbs_and_nouns(self):
        text = ("the children ran across the bridge and saw two mice "
                "near the frozen river")
        assert stems(text) == [
            "children", "ran", "across", "bridg", "saw", "two", "mice",
            "near", "frozen", "river",
        ]
        assert stems(text, DEFAULT_LEMMA_TABLE) == [
            "child", "run", "across", "bridg", "see", "two", "mous",
            "near", "freez", "river",
        ]

    def test_latinate_plurals_and_participles(self):
        text = "she wrote books, taught classes and has taken many analyses home"
        assert stems(text, DEFAULT_LEMMA_TABLE) == [
            "write", "book", "teach", "class", "take", "mani",
            "analysi", "home",
        ]

    def test_regular_inflection_unchanged_by_table(self):
        # Porter collapses regular forms identically with or without a
        # lemma step — the table only moves irregulars
        text = "studies walking jumped fastest"
        assert stems(text) == stems(text, DEFAULT_LEMMA_TABLE)

    def test_default_identity_path_is_round1_semantics(self):
        text = "the children ran and went home"
        assert stems(text) == stems(text, None) == [
            "children", "ran", "went", "home",
        ]


class TestTableLoading:
    def test_tsv_roundtrip(self, tmp_path):
        p = tmp_path / "lemma.tsv"
        p.write_text("# comment\nRan\trun\nmice\tmouse\n\nwent\tgo\n")
        table = load_lemma_table(str(p))
        assert table == {"ran": "run", "mice": "mouse", "went": "go"}
        assert stems("the mice went", table) == ["mous", "go"]

    def test_caches_are_per_table(self):
        t1 = {"ran": "run"}
        t2 = {"ran": "sprint"}
        assert stems("ran", t1) == ["run"]
        assert stems("ran", t2) == ["sprint"]
        assert stems("ran", t1) == ["run"]
        assert stems("ran") == ["ran"]


class TestLemmaEndToEnd:
    @pytest.fixture(scope="class")
    def lemma_corpus(self):
        texts = [
            "the children ran to the old castle and saw the frozen river",
            "tourists bought tickets and went inside the castle museum",
            "she wrote about mice and geese she saw near the bridge",
            "students taught classes and held seminars in the library",
            "the bakery sold fresh loaves and the wives made cheese",
            "ray data pipelines stream arrow batches with backpressure",
        ]
        return pd.DataFrame({
            "doc_id": range(len(texts)),
            "url": [f"https://ex{i}.com/" for i in range(len(texts))],
            "text": texts,
        })

    def test_engine_matches_oracle_with_table_enabled(
            self, ray_session, lemma_corpus, tmp_path):
        """Build + serve with lemma_table on BOTH sides: ranks and
        scores must stay bit-identical to the sequential oracle (the
        same conformance bar the identity path holds)."""
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.oracle import (
            build_oracle_index,
            oracle_search,
        )
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.query import QueryEngine

        cfg = IndexConfig(prepend_url_words=False, num_shards=4,
                          min_df_exclusive=0,
                          lemma_table=DEFAULT_LEMMA_TABLE)
        index_dir = str(tmp_path / "idx")
        build_index(rd.from_pandas(lemma_corpus[["doc_id", "text"]]),
                    index_dir, cfg=cfg, corpus_id="lemma-test")
        oi = build_oracle_index(
            [(int(r.doc_id), "", "", r.text)
             for r in lemma_corpus.itertuples()], cfg=cfg,
        )
        engine = QueryEngine(index_dir, num_scorers=2,
                             lemma_table=DEFAULT_LEMMA_TABLE)
        try:
            for q in ("children running castle", "mice frozen river",
                      "bought tickets museum", "wrote classes"):
                got = engine.search(q)
                want = oracle_search(oi, q,
                                     lemma_table=DEFAULT_LEMMA_TABLE)
                assert [d for d, _ in got] == [d for d, _ in want], q
                for (_, a), (_, b) in zip(got, want):
                    assert a == b, q
        finally:
            engine.shutdown()

    def test_lemma_index_retrieves_irregular_forms(
            self, ray_session, lemma_corpus, tmp_path):
        """The point of the table: a query using the base form must hit
        documents containing only the irregular inflection."""
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.query import QueryEngine

        cfg = IndexConfig(prepend_url_words=False, num_shards=4,
                          min_df_exclusive=0,
                          lemma_table=DEFAULT_LEMMA_TABLE)
        index_dir = str(tmp_path / "idx2")
        build_index(rd.from_pandas(lemma_corpus[["doc_id", "text"]]),
                    index_dir, cfg=cfg, corpus_id="lemma-test2")
        engine = QueryEngine(index_dir, num_scorers=2,
                             lemma_table=DEFAULT_LEMMA_TABLE)
        try:
            # "see" only appears as "saw" in the corpus; "goose" as "geese"
            hits = engine.search_bm25("see goose", k=5)
            assert {d for d, _ in hits} >= {2}
        finally:
            engine.shutdown()


class TestRound3Inventory:
    def test_expanded_irregular_coverage(self):
        from modernsearchengines_ray.functions.lemma import (
            DEFAULT_LEMMA_TABLE as T,
        )

        # round-3 additions: completed verb inventory, Latin/Greek
        # plurals, suppletive comparatives
        assert T["underwent"] == "undergo"
        assert T["forsaken"] == "forsake"
        assert T["trodden"] == "tread"
        assert T["corpora"] == "corpus"
        assert T["spectra"] == "spectrum"
        assert T["better"] == "good"
        assert len(T) >= 300
        # every mapping is a fixpoint chain: form -> lemma -> lemma
        for form, lemma in T.items():
            assert T.get(lemma, lemma) == lemma, (form, lemma)

    def test_expanded_forms_flow_through_tokenizer(self):
        from modernsearchengines_ray.functions.lemma import (
            DEFAULT_LEMMA_TABLE,
        )
        from modernsearchengines_ray.functions.tokenizer import tokenize

        toks = [t for t, _ in tokenize(
            "the committee underwent restructuring across corpora",
            lemma_table=DEFAULT_LEMMA_TABLE)]
        assert "undergo" in toks
        assert "corpu" in toks or "corpus" in toks  # post-Porter stem
