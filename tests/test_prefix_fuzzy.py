"""Prefix / fuzzy (Lucene multi-term query analogue) conformance.

Truth model: the session ``prepared`` fixture's vendored oracle index
(post df<=5 prune) supplies the term dictionary and per-stem posting
sets; a prefix/fuzzy search must hit exactly the union of the matched
dictionary stems' postings.
"""

from __future__ import annotations

import pytest

from modernsearchengines_ray.functions.editdist import levenshtein


class TestLevenshtein:
    def test_known_distances(self):
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("stram", "stream") == 1
        assert levenshtein("flaw", "lawn") == 2
        # NO transposition shortcut (matches DuckDB's levenshtein)
        assert levenshtein("ab", "ba") == 2

    def test_cap_early_exit(self):
        assert levenshtein("kitten", "sitting", cap=1) == 2
        assert levenshtein("aaaaaaaa", "bbbbbbbb", cap=2) == 3
        assert levenshtein("abc", "abd", cap=1) == 1

    def test_symmetric(self):
        assert levenshtein("spark", "park") == levenshtein("park", "spark")


@pytest.fixture(scope="module")
def engine(prepared):
    from modernsearchengines_ray.pipelines.query import QueryEngine

    _, index_dir, _, _ = prepared
    eng = QueryEngine(index_dir, num_scorers=2)
    yield eng
    eng.shutdown()


def _vocab(oracle_index) -> list[str]:
    return sorted(oracle_index.index.keys())


def _docs_union(oracle_index, stems) -> set[int]:
    out: set[int] = set()
    for s in stems:
        out |= set(oracle_index.index.get(s, {}))
    return out


class TestTermDict:
    """The sorted-dictionary matchers (VERDICT r3 #2): results equal
    the brute-force scan AND the Python-level scan is provably
    sublinear (n_scanned returned by every matcher)."""

    @pytest.fixture(scope="class")
    def vocab(self):
        # synthetic vocab with shared prefixes, length spread, and
        # regex-shaped families; large enough that linear != sublinear
        words = [f"stem{i:05d}" for i in range(2000)]
        words += [f"pre{i % 7}fix{i:04d}" for i in range(1000)]
        words += ["cat", "cats", "category", "dog", "dodge", "dig",
                  "stream", "stram", "streams", "a", "z" * 40]
        return sorted(set(words))

    @pytest.fixture(scope="class")
    def td(self, vocab):
        from modernsearchengines_ray.functions.termdict import TermDict

        return TermDict(vocab)

    def test_prefix_exact_and_zero_scanned(self, td, vocab):
        got, scanned = td.prefix("cat")
        assert got == [w for w in vocab if w.startswith("cat")]
        assert scanned == 0
        got, scanned = td.prefix("")
        assert got == vocab and scanned == 0
        assert td.prefix("zzzz")[0] == ["z" * 40]
        assert td.prefix("qqq")[0] == []

    def test_range_exact_and_zero_scanned(self, td, vocab):
        got, scanned = td.range("cat", "dog")
        assert got == [w for w in vocab if "cat" <= w < "dog"]
        assert scanned == 0
        got, _ = td.range("", "d")
        assert got == [w for w in vocab if w < "d"]
        got, _ = td.range("stem", "")
        assert got == [w for w in vocab if w >= "stem"]

    def test_fuzzy_exact_and_length_banded(self, td, vocab):
        from modernsearchengines_ray.functions.editdist import (
            levenshtein)

        got, scanned = td.fuzzy("stream", max_edits=1)
        want = [w for w in vocab if levenshtein(w, "stream", cap=1) <= 1]
        assert sorted(got) == sorted(want)
        band = [w for w in vocab if abs(len(w) - 6) <= 1]
        assert scanned == len(band)
        assert scanned < len(vocab) // 3  # the point: no full scan

    def test_regex_literal_prefix_window(self, td, vocab):
        got, scanned = td.regex(r"cat.*")
        assert sorted(got) == sorted(
            w for w in vocab if w.startswith("cat"))
        # the scan window is the "cat" prefix range, not the vocab
        assert scanned == len([w for w in vocab if w.startswith("cat")])
        got, scanned = td.regex(r"do(g|dge)")
        assert sorted(got) == ["dodge", "dog"]
        assert scanned == len([w for w in vocab if w.startswith("do")])

    def test_regex_no_literal_prefix_degrades_to_full(self, td, vocab):
        got, scanned = td.regex(r".*0042")
        assert sorted(got) == sorted(w for w in vocab
                                     if w.endswith("0042"))
        assert scanned == len(vocab)

    def test_dispatch_and_bad_kind(self, td):
        assert td.match("prefix", "cat")[0] == td.prefix("cat")[0]
        assert td.match("range", "cat\x00dog")[0] == \
            td.range("cat", "dog")[0]
        with pytest.raises(ValueError):
            td.match("bogus", "x")


class TestPrefix:
    def test_expansion_matches_dictionary(self, engine, prepared):
        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        probe = vocab[0][:2]
        want = sorted(t for t in vocab if t.startswith(probe))
        assert engine.expand_terms("prefix", probe) == want
        assert len(want) >= 1

    def test_hits_are_posting_union(self, engine, prepared):
        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        probe = vocab[len(vocab) // 2][:1]
        want_terms = [t for t in vocab if t.startswith(probe)]
        want_docs = _docs_union(oracle_index, want_terms)
        hits = engine.search_prefix(probe, k=10_000)
        assert {d for d, _ in hits} == want_docs
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)

    def test_no_match_is_empty(self, engine):
        assert engine.search_prefix("zzzzzzzzq") == []

    def test_k_truncates(self, engine, prepared):
        vocab = _vocab(prepared[3])
        probe = vocab[len(vocab) // 2][:1]
        assert len(engine.search_prefix(probe, k=3)) <= 3


class TestFuzzy:
    def test_expansion_matches_dictionary(self, engine, prepared):
        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        base = max(vocab, key=len)
        probe = base[:-1] + "q"  # one substitution away from base
        want = sorted(t for t in vocab if levenshtein(t, probe) <= 1)
        assert base in want
        assert engine.expand_terms("fuzzy", probe, 1) == want

    def test_hits_are_posting_union(self, engine, prepared):
        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        base = max(vocab, key=len)
        probe = base + "x"  # one insertion away
        want_terms = [t for t in vocab if levenshtein(t, probe) <= 1]
        want_docs = _docs_union(oracle_index, want_terms)
        hits = engine.search_fuzzy(probe, max_edits=1, k=10_000)
        assert {d for d, _ in hits} == want_docs
        assert len(want_docs) > 0

    def test_wider_edit_radius_superset(self, engine, prepared):
        vocab = _vocab(prepared[3])
        base = max(vocab, key=len)
        probe = base[:-1] + "q"
        e1 = set(engine.expand_terms("fuzzy", probe, 1))
        e2 = set(engine.expand_terms("fuzzy", probe, 2))
        assert e1 <= e2

    def test_exact_term_distance_zero(self, engine, prepared):
        vocab = _vocab(prepared[3])
        base = vocab[0]
        assert base in engine.expand_terms("fuzzy", base, 0)

    def test_bad_kind_raises(self, engine):
        import ray

        with pytest.raises(Exception):
            ray.get(engine.scorers[0].match_terms.remote("glob", "x"))


class TestRegex:
    def test_expansion_is_fullmatch(self, engine, prepared):
        import re

        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        base = max(vocab, key=len)
        # a pattern that fullmatches base but only PARTIALLY matches
        # its extensions: anchoring must be implicit
        pattern = re.escape(base)
        got = engine.expand_terms("regex", pattern)
        assert got == [t for t in vocab if re.fullmatch(pattern, t)]
        assert base in got

    def test_hits_are_posting_union(self, engine, prepared):
        oracle_index = prepared[3]
        vocab = _vocab(oracle_index)
        first = vocab[0][0]
        pattern = f"{first}[a-z0-9]*"
        import re

        want_terms = [t for t in vocab if re.fullmatch(pattern, t)]
        want_docs = _docs_union(oracle_index, want_terms)
        hits = engine.search_regex(pattern, k=10_000)
        assert {d for d, _ in hits} == want_docs
        assert len(want_terms) >= 1

    def test_no_match_is_empty(self, engine):
        assert engine.search_regex("zz+qq+") == []
