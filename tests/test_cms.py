"""Count-min sketch properties + wildcard/term-range engine queries."""

from __future__ import annotations

import numpy as np
import pytest

from modernsearchengines_ray.functions.cms import CountMinSketch


class TestCountMinSketch:
    def test_estimate_never_undercounts(self):
        cms = CountMinSketch(width=64, depth=4)  # tiny: force collisions
        rng = np.random.default_rng(5)
        truth = {f"w{i}": int(rng.integers(1, 50)) for i in range(300)}
        for w, c in truth.items():
            cms.add(w, c)
        assert all(cms.estimate(w) >= c for w, c in truth.items())
        assert cms.total == sum(truth.values())

    def test_exact_when_sparse(self):
        cms = CountMinSketch(width=2048, depth=4)
        for w, c in [("a", 3), ("b", 7), ("c", 1)]:
            cms.add(w, c)
        assert cms.estimate("a") == 3
        assert cms.estimate("b") == 7
        assert cms.estimate("zz") == 0

    def test_merge_equals_single_sketch(self):
        a, b, ab = (CountMinSketch(width=128, depth=3) for _ in range(3))
        for i in range(100):
            a.add(f"x{i}", i + 1)
            ab.add(f"x{i}", i + 1)
        for i in range(50, 150):
            b.add(f"x{i}", 2)
            ab.add(f"x{i}", 2)
        a.merge(b)
        assert np.array_equal(a.counts, ab.counts)

    def test_round_trip_and_determinism(self):
        a = CountMinSketch()
        a.add_counts([("q", 5), ("r", 2)])
        b = CountMinSketch.from_counts(a.counts.ravel().copy())
        assert b.estimate("q") == 5
        c = CountMinSketch()
        c.add_counts([("q", 5), ("r", 2)])
        assert np.array_equal(a.counts, c.counts)

    def test_depth_bounds(self):
        with pytest.raises(ValueError):
            CountMinSketch(depth=5)
        with pytest.raises(ValueError):
            CountMinSketch(depth=0)


@pytest.fixture(scope="module")
def engine(prepared):
    from modernsearchengines_ray.pipelines.query import QueryEngine

    _, index_dir, _, _ = prepared
    eng = QueryEngine(index_dir, num_scorers=2)
    yield eng
    eng.shutdown()


class TestWildcardAndRange:
    def test_wildcard_star_is_prefix(self, engine, prepared):
        vocab = sorted(prepared[3].index.keys())
        probe = vocab[0][:2]
        assert (engine.search_wildcard(probe + "*", k=10_000)
                == engine.search_prefix(probe, k=10_000))

    def test_wildcard_question_single_char(self, engine, prepared):
        import re

        vocab = sorted(prepared[3].index.keys())
        base = max(vocab, key=len)
        probe = "?" + base[1:]
        want = {t for t in vocab if re.fullmatch("." + re.escape(base[1:]), t)}
        hits_terms = set(engine.expand_terms(
            "regex", "." + re.escape(base[1:])))
        assert base in hits_terms
        assert hits_terms == want
        assert engine.search_wildcard(probe, k=10_000) \
            == engine.search_regex("." + re.escape(base[1:]), k=10_000)

    def test_term_range_halfopen(self, engine, prepared):
        vocab = sorted(prepared[3].index.keys())
        lo, hi = vocab[1], vocab[min(4, len(vocab) - 1)]
        got = engine.expand_terms("range", f"{lo}\x00{hi}")
        assert got == [t for t in vocab if lo <= t < hi]

    def test_term_range_open_ends(self, engine, prepared):
        vocab = sorted(prepared[3].index.keys())
        assert engine.expand_terms("range", "\x00") == vocab
        hi = vocab[2]
        assert engine.expand_terms("range", f"\x00{hi}") \
            == [t for t in vocab if t < hi]
