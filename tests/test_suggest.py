"""Dictionary autocomplete (QueryEngine.suggest) vs full-scan truth."""

from __future__ import annotations

import pytest


def _truth(postings, prefix: str, n: int) -> list[tuple[str, int]]:
    return sorted(
        ((t, len(docs)) for t, docs in postings.items()
         if t.startswith(prefix)),
        key=lambda x: (-x[1], x[0]))[:n]


class TestSuggest:
    @pytest.mark.parametrize("num_scorers", [1, 2, 3])
    def test_vs_index_scan(self, prepared, num_scorers):
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.shards import load_index_postings

        _, index_dir, _, _ = prepared
        postings = load_index_postings(index_dir)
        engine = QueryEngine(index_dir, num_scorers=num_scorers)
        try:
            nonempty = 0
            for prefix in ("ca", "mu", "s", "tub", "zzzz"):
                got = engine.suggest(prefix, n=10)
                want = _truth(postings, prefix, 10)
                assert got == want, prefix
                nonempty += bool(want)
            assert nonempty >= 3          # the probes actually probe
        finally:
            engine.shutdown()

    def test_case_folding_and_n(self, prepared):
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.state.shards import load_index_postings

        _, index_dir, _, _ = prepared
        postings = load_index_postings(index_dir)
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            assert engine.suggest("CA", n=3) == _truth(postings, "ca", 3)
            # n larger than the window: every completion, still ranked
            want_all = _truth(postings, "mus", 10**6)
            assert engine.suggest("mus", n=10**6) == want_all
        finally:
            engine.shutdown()
