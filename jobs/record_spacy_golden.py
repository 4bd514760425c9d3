"""Record a spaCy lemma golden for the tokenizer parity test (M14).

Run OFFLINE on a machine with ``spacy`` + ``en_core_web_sm`` installed
(neither is in this container — the parity test skips until the golden
exists):

    python jobs/record_spacy_golden.py tests/goldens/spacy_lemma_golden.tsv

What it records — exactly what the reference consumes
(/root/reference/indexing.py:130-159: spaCy doc iteration, stop/punct
drop, ``token.lemma_`` then Porter):

1. the fixture corpus (tests/fixtures.py, n=200 seed=42) processed as
   full documents, so lemmas carry spaCy's CONTEXTUAL tagging; and
2. a probe list of every irregular form vendored in
   functions/lemma.DEFAULT_LEMMA_TABLE plus common regular
   inflections, processed in a neutral carrier sentence.

Output: ``form<TAB>lemma`` TSV (the load_lemma_table format), one row
per distinct lowercased surface form, '#'-comment header with the
model version for provenance.  tests/test_lemma_golden.py then fails
whenever the repo's lemma hook diverges from this recording on any
stem-visible form.
"""

from __future__ import annotations

import sys


def main(out_path: str) -> None:
    import spacy

    nlp = spacy.load("en_core_web_sm")

    sys.path.insert(0, ".")
    from tests.fixtures import make_pages

    from modernsearchengines_ray.functions.html_extract import extract_page
    from modernsearchengines_ray.functions.lemma import DEFAULT_LEMMA_TABLE

    pairs: dict[str, str] = {}

    def record(text: str) -> None:
        for tok in nlp(text):
            if tok.is_stop or tok.is_punct or not tok.text.strip():
                continue
            form = tok.text.lower()
            if form not in pairs:  # first (document-order) reading wins
                pairs[form] = tok.lemma_.lower()

    pages = make_pages(n=200, seed=42)
    for i in range(pages.num_rows):
        text, _lang, _site = extract_page(
            pages["html"][i].as_py(), pages["url"][i].as_py())
        record(text)

    probes = sorted(set(DEFAULT_LEMMA_TABLE)
                    | set(DEFAULT_LEMMA_TABLE.values()))
    for form in probes:
        record(f"they {form} it yesterday .")

    with open(out_path, "w", encoding="utf-8") as f:
        f.write(f"# spacy={spacy.__version__} "
                f"model=en_core_web_sm/{nlp.meta['version']}\n")
        for form in sorted(pairs):
            f.write(f"{form}\t{pairs[form]}\n")
    print(f"wrote {len(pairs)} (form, lemma) pairs to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "tests/goldens/spacy_lemma_golden.tsv")
