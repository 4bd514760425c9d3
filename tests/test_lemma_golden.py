"""spaCy lemma parity (M14, VERDICT r3 next-round #3).

Three tiers, strongest available wins:

1. LIVE: spaCy + en_core_web_sm importable -> compare the lemma hook
   against real tagger output directly (skip-marked here: neither is
   in this container, same policy as the live BERT/spellcheck tests).
2. GOLDEN: a recorded ``tests/goldens/spacy_lemma_golden.tsv``
   (produced offline by jobs/record_spacy_golden.py) -> fail whenever
   DEFAULT_LEMMA_TABLE + Porter diverges from the recording on any
   stem-visible form, and verify the hook reproduces the recorded
   stream end-to-end when fed the golden as its table.
3. Neither -> skip with the recording instructions.

Plus the documented-coverage fact the verdict asked for: on the
synthetic fixture corpus the measured irregular-form occurrence count
is ZERO (the generator vocabulary contains no English irregular
inflections), so the identity-vs-table divergence surface on the
conformance fixtures is empty — pinned below so a fixture change that
invalidates the claim fails loudly.
"""

from __future__ import annotations

import os

import pytest

from modernsearchengines_ray.functions.lemma import (
    DEFAULT_LEMMA_TABLE,
    load_lemma_table,
)
from modernsearchengines_ray.functions.porter import porter_stem
from modernsearchengines_ray.functions.tokenizer import tokenize

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "spacy_lemma_golden.tsv")


def _fixture_surface_counts():
    """Distinct pre-stem surface forms of the fixture corpus with
    occurrence counts (the raw token stream the lemma step sees)."""
    import re
    from collections import Counter

    from tests.fixtures import make_pages

    from modernsearchengines_ray.functions.html_extract import extract_page
    from modernsearchengines_ray.functions.textnorm import (
        normalize_chunk, split_text,
    )
    from modernsearchengines_ray.functions.tokenizer import _TOKEN_RE

    counts: Counter = Counter()
    pages = make_pages(n=200, seed=42)
    for i in range(pages.num_rows):
        text, _lang, _site = extract_page(
            pages["html"][i].as_py(), pages["url"][i].as_py())
        for chunk in split_text(text, 800_000):
            for m in _TOKEN_RE.finditer(normalize_chunk(chunk)):
                counts[m.group().lower()] += 1
    return counts


def _regular_bases(form: str) -> set[str]:
    """Candidate bases for a REGULAR English inflection of ``form`` —
    the de-inflections a rule lemmatizer (spaCy's suffix rules) could
    produce: plural -s/-es/-ies, past -ed (incl. doubled consonant),
    gerund -ing (incl. doubled consonant and e-restoration)."""
    out = set()
    if len(form) > 3 and form.endswith("ies"):
        out.add(form[:-3] + "y")
    if len(form) > 2 and form.endswith("es"):
        out.update([form[:-2], form[:-1]])
    if len(form) > 1 and form.endswith("s") and not form.endswith("ss"):
        out.add(form[:-1])
    if len(form) > 3 and form.endswith("ed"):
        out.update([form[:-2], form[:-1]])
        if len(form) > 4 and form[-3] == form[-4]:
            out.add(form[:-3])          # stopped -> stop
    if len(form) > 4 and form.endswith("ing"):
        out.update([form[:-3], form[:-3] + "e"])
        if len(form) > 5 and form[-4] == form[-5]:
            out.add(form[:-4])          # running -> run
    return {b for b in out if len(b) >= 2}


class TestLemmaGolden:
    def test_regular_inflection_divergence_bound_zero(self):
        """VERDICT r4 #5: the MEASURED M14 divergence bound.  A spaCy
        lemma is stem-visible only when Porter(lemma) differs from
        Porter(surface); for regular inflections the lemma is one of
        the rule de-inflections enumerated by _regular_bases.  Over
        the full fixture token stream, the occurrence-weighted share
        of non-stopword tokens with ANY stem-visible de-inflection is
        measured at exactly 0.0000% (round 5; irregular forms were
        separately measured at zero occurrences in round 4), so
        identity-lemma conformance on the fixtures is exact against
        any de-inflecting lemmatizer — pinned here so a fixture or
        tokenizer change that reopens the exposure fails loudly."""
        counts = _fixture_surface_counts()
        from modernsearchengines_ray.functions.tokenizer import STOPWORDS

        suspect = {}
        for form, c in counts.items():
            if form in STOPWORDS or form in DEFAULT_LEMMA_TABLE:
                continue
            fs = porter_stem(form)
            bad = [b for b in _regular_bases(form)
                   if porter_stem(b) != fs]
            if bad:
                suspect[form] = (c, bad)
        assert not suspect, (
            f"fixture stream gained {len(suspect)} stem-visible "
            f"regular-inflection forms; re-measure the M14 bound and "
            f"update lemma.py's parity-evidence note: {suspect}")

    def test_golden_parity_when_recorded(self):
        if not os.path.exists(GOLDEN):
            pytest.skip(
                "spaCy golden not recorded: spacy/en_core_web_sm absent "
                "in this container; run jobs/record_spacy_golden.py "
                "offline to enable this parity gate")
        golden = load_lemma_table(GOLDEN)
        # (a) stem-visible agreement: wherever the recording's lemma
        # stems differently from the raw form, our table must make the
        # same rewrite — these are exactly the index-observable cases
        divergent = []
        for form, lemma in golden.items():
            want = porter_stem(lemma)
            got = porter_stem(DEFAULT_LEMMA_TABLE.get(form, form))
            if want != got:
                divergent.append((form, lemma,
                                  DEFAULT_LEMMA_TABLE.get(form, form)))
        assert not divergent, (
            f"{len(divergent)} stem-visible divergences from recorded "
            f"spaCy output, first 20: {divergent[:20]}")
        # (b) the hook reproduces the recorded stream when fed the
        # golden itself (end-to-end plumbing, reference
        # indexing.py:148-159 order)
        forms = sorted(golden)[:200]
        text = " ".join(forms)
        got = [t for t, _ in tokenize(text, lemma_table=golden)]
        want = []
        from modernsearchengines_ray.functions.tokenizer import STOPWORDS
        for f in forms:
            if f in STOPWORDS:
                continue
            want.append(porter_stem(golden.get(f, f)))
        assert got == want

    def test_live_spacy_parity(self):
        spacy = pytest.importorskip("spacy")
        try:
            nlp = spacy.load("en_core_web_sm")
        except OSError:
            pytest.skip("en_core_web_sm model not installed")
        probes = sorted(DEFAULT_LEMMA_TABLE)
        divergent = []
        for form in probes:
            doc = nlp(f"they {form} it yesterday .")
            tok = next(t for t in doc if t.text == form)
            want = porter_stem(tok.lemma_.lower())
            got = porter_stem(DEFAULT_LEMMA_TABLE[form])
            if want != got:
                divergent.append((form, tok.lemma_,
                                  DEFAULT_LEMMA_TABLE[form]))
        # context-free table vs tagger: small POS-reading slack allowed
        assert len(divergent) < len(probes) * 0.05, divergent[:20]

    def test_fixture_corpus_has_no_irregular_forms(self):
        """Documented coverage fact: the conformance fixtures' token
        stream contains ZERO irregular inflections, so identity-lemma
        conformance runs are exact regardless of table choice.  If the
        fixture generator ever grows irregular vocabulary, this fails
        and the conformance story must be re-examined."""
        counts = _fixture_surface_counts()
        hits = {f: counts[f] for f in counts if f in DEFAULT_LEMMA_TABLE}
        assert hits == {}, f"fixture now contains irregulars: {hits}"
        # and the fixture genuinely has vocabulary to speak about
        assert sum(counts.values()) > 10_000

    def test_table_rewrites_are_stem_visible(self):
        """Every vendored irregular entry must be OBSERVABLE (its stem
        differs from the raw form's stem) — a stem-invisible entry is
        dead weight and hides coverage gaps in the counts."""
        dead = [f for f, lem in DEFAULT_LEMMA_TABLE.items()
                if porter_stem(f) == porter_stem(lem)]
        # a handful of legitimately stem-coincident irregulars exist
        # (e.g. burst->burst); keep them documented, bound the rest
        assert len(dead) <= 12, dead
