"""M19/M17 live stages: fill-mask synonym expansion + EN->DE spellcheck.

The reference logic (prompt set, counting, filter rules; EN-then-DE
fallback) is fully testable with injected fakes; the model/package
loading paths are skip-marked for hosts that have transformers /
pyspellchecker installed.
"""

from __future__ import annotations

import importlib.util

import pytest

HAS_TRANSFORMERS = importlib.util.find_spec("transformers") is not None
HAS_PYSPELL = importlib.util.find_spec("spellchecker") is not None


def fake_fill_mask(responses: dict[str, list[str]]):
    """fill_mask stub: maps a substring probe of the prompt to tokens."""
    def fill(prompt: str):
        for probe, tokens in responses.items():
            if probe in prompt:
                return [{"token_str": t} for t in tokens]
        return [{"token_str": "generic"}]
    return fill


class TestSynonymLogic:
    def test_counting_and_rank_order(self):
        from modernsearchengines_ray.stages.synonyms import synonyms_for_word

        # 'inn' appears in every prompt's answer, 'tavern' in one
        def fill(prompt):
            out = [{"token_str": " inn "}]
            if "synonym" in prompt:
                out.append({"token_str": "tavern"})
            return out

        got = synonyms_for_word("hotel", fill)
        assert got[0] == "inn"                 # highest count first
        assert "tavern" in got

    def test_filtered_synonyms_dropped(self):
        from modernsearchengines_ray.stages.synonyms import synonyms_for_word

        fill = fake_fill_mask({"": ["word", "god", "love", "hostel"]})
        assert synonyms_for_word("hotel", fill) == ["hostel"]

    def test_partially_filtered_word_uses_first_three_prompts_and_caps(self):
        from modernsearchengines_ray.stages.synonyms import (
            CONTEXT_SENTENCES,
            synonyms_for_word,
        )

        seen = []

        def fill(prompt):
            seen.append(prompt)
            # distinct token per call: rank = first-seen order
            return [{"token_str": f"t{len(seen)}"}]

        got = synonyms_for_word("cheap", fill)
        # all 13 prompts are still ISSUED (reference behavior) but only
        # the first three count, and the result caps at two
        assert len(seen) == len(CONTEXT_SENTENCES)
        assert got == ["t1", "t2"]

    def test_tie_order_is_first_seen(self):
        from modernsearchengines_ray.stages.synonyms import synonyms_for_word

        fill = fake_fill_mask({"": ["zeta", "alpha"]})
        # equal counts -> insertion (first-seen) order, NOT alphabetical
        assert synonyms_for_word("hotel", fill) == ["zeta", "alpha"]

    def test_actor_pool_stage_builds_table(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.synonyms import (
            build_synonyms_table,
        )

        fill = fake_fill_mask({"castle": ["fortress", "palace"],
                               "museum": ["gallery"]})
        words = rd.from_items([{"word": "castle"}, {"word": "museum"}])
        table = build_synonyms_table(words, fill_mask=fill, concurrency=1)
        assert table["castle"][0] == "fortress"
        assert table["museum"] == ["gallery", "generic"] or \
            "gallery" in table["museum"]

    def test_table_feeds_query_engine_unchanged(self, prepared):
        """The frozen-table serving path consumes a live-built table
        with no code change."""
        from modernsearchengines_ray.pipelines.query import QueryEngine
        from modernsearchengines_ray.stages.synonyms import (
            build_synonyms_table,
        )

        _corpus_df, index_dir, _result, _oi = prepared
        fill = fake_fill_mask({"castle": ["fortress"]})
        table = build_synonyms_table(["castle"], fill_mask=fill)
        engine = QueryEngine(index_dir, num_scorers=2,
                             synonyms_table=table)
        try:
            hits = engine.search("castle")
            assert isinstance(hits, list)
        finally:
            engine.shutdown()

    def test_missing_transformers_raises_at_construction(self):
        if HAS_TRANSFORMERS:
            pytest.skip("transformers installed — load path is live")
        from modernsearchengines_ray.stages.synonyms import FillMaskSynonyms

        with pytest.raises(ImportError, match="transformers"):
            FillMaskSynonyms()

    @pytest.mark.skipif(not HAS_TRANSFORMERS,
                        reason="transformers not installed")
    def test_live_fill_mask_model(self):
        from modernsearchengines_ray.stages.synonyms import synonyms_for_word
        from modernsearchengines_ray.stages.synonyms import (
            _load_transformers_fill_mask,
        )

        fm = _load_transformers_fill_mask("bert-base-uncased")
        got = synonyms_for_word("food", fm)
        assert got and all(isinstance(s, str) for s in got)


class TestTwoStageSpellcheck:
    def make(self):
        from modernsearchengines_ray.functions.spellcheck import (
            SpellChecker,
            TwoStageSpellChecker,
        )

        en = SpellChecker({"castle": 10, "river": 5, "market": 3})
        de = SpellChecker({"schloss": 10, "markt": 4})
        return TwoStageSpellChecker(en, de)

    def test_known_en_word_kept(self):
        assert self.make().correction("castle") == "castle"

    def test_en_correction_preferred(self):
        assert self.make().correction("castel") == "castle"

    def test_de_fallback_when_en_offers_nothing(self):
        # 'schlosz' is >2 edits from every EN word but edit-1 from
        # the DE 'schloss'
        assert self.make().correction("schlosz") == "schloss"

    def test_word_kept_when_both_fail(self):
        assert self.make().correction("zzzzqqqq") == "zzzzqqqq"

    def test_whitelist_survives(self):
        from modernsearchengines_ray.functions.spellcheck import (
            SpellChecker,
            TwoStageSpellChecker,
        )

        two = TwoStageSpellChecker(SpellChecker({}), SpellChecker({}))
        assert two.correct_query("tübingen tuebingen") == \
            "tübingen tuebingen"

    def test_query_engine_accepts_two_stage(self, prepared):
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _corpus_df, index_dir, _result, _oi = prepared
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            rows = engine.search_full("castel", spellchecker=self.make())
            assert isinstance(rows, list)
        finally:
            engine.shutdown()

    def test_missing_pyspellchecker_raises(self):
        if HAS_PYSPELL:
            pytest.skip("pyspellchecker installed — load path is live")
        from modernsearchengines_ray.functions.spellcheck import (
            TwoStageSpellChecker,
        )

        with pytest.raises(ImportError, match="pyspellchecker"):
            TwoStageSpellChecker.from_pyspellchecker()

    @pytest.mark.skipif(not HAS_PYSPELL,
                        reason="pyspellchecker not installed")
    def test_live_pyspellchecker_dictionaries(self):
        from modernsearchengines_ray.functions.spellcheck import (
            TwoStageSpellChecker,
        )

        two = TwoStageSpellChecker.from_pyspellchecker()
        assert two.correction("castle") == "castle"
        assert two.correction("tübingen") == "tübingen"
