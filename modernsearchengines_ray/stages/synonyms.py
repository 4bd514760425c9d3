"""BERT fill-mask synonym expansion (M19/T2, retrieval.py:73-116).

The reference queries a HuggingFace ``fill-mask`` pipeline with 13
context-sentence prompts per word, counts candidate tokens across
prompts, and keeps them sorted by occurrence count.  This container has
no ``transformers``, so the stage is split:

- :func:`synonyms_for_word` — the reference's exact counting/filter
  logic over an INJECTED ``fill_mask`` callable (prompt strings,
  filter sets and the ``i > 2`` partial-filter rule replicated verbatim
  from retrieval.py:75-116 — they ARE the spec, including the
  reference's own prompt typos);
- :class:`FillMaskSynonyms` — the actor-pool ``map_batches`` stage: the
  model loads ONCE per actor in ``__init__`` (via ``transformers`` when
  present, else any injected callable; absence raises ``ImportError``
  at construction, so the frozen-table path stays the default);
- :func:`build_synonyms_table` — words -> {word: [synonyms]} for
  ``QueryEngine(synonyms_table=...)``; the serving path is unchanged
  (the table is the interface, live expansion just fills it).
"""

from __future__ import annotations

import pyarrow as pa

#: retrieval.py:77-90 — context prompts, verbatim (typos included).
CONTEXT_SENTENCES: tuple[str, ...] = (
    "The word [MASK] is a synonym for the word {word}.",
    "The word [MASK] means the same as the word {word}.",
    "Tourists that look for {word} should search for the word [MASK] "
    "in their search engine.",
    "People, that look for {word} should search for the word [MASK] "
    "in their search engine.",
    "Tourists that are visiting a university town, that look for {word} "
    "should search for the word [MASK] in their search engine.",
    "People that look for {word} should search for the word [MASK] "
    "in their search engine.",
    "In Tübingen, a [MASK] is a place where people can find {word}.",
    "For tourists that are in a university town that has a castle and "
    "is next a river, a [MASK] is a place where people can find {word}.",
    "Most poeple think that [MASK] is a place where people can find "
    "{word}.",
    "In a conversation about {word} the word [MASK] could come up.",
    "The word [MASK] can often be found in a guide about {word}.",
    "The word [MASK] is a type of {word}.",
    "{word} is or are a type of [MASK].",
)

#: retrieval.py:92 — candidates never kept.
FILTERED_SYNONYMS = frozenset({"word", "words", "fuck", "bad", "god", "love"})

#: retrieval.py:94 — words that only use the first three prompts
#: (the reference's ``i > 2`` check) and cap results at two.
PARTIALLY_FILTERED_WORDS = frozenset(
    {"expensive", "inexpensive", "cheap", "rare", "unique", "special"}
)


def synonyms_for_word(word: str, fill_mask) -> list[str]:
    """Reference ``get_synonyms_with_bert`` (retrieval.py:73-116) over an
    injected ``fill_mask(prompt) -> [{'token_str': ...}, ...]``.

    Counting dict is insertion-ordered and the sort is stable, so ties
    keep first-seen order — exactly the reference's behavior."""
    counts: dict[str, int] = {}
    for i, template in enumerate(CONTEXT_SENTENCES):
        for result in fill_mask(template.format(word=word)):
            synonym = result["token_str"].strip()
            if synonym in FILTERED_SYNONYMS:
                continue
            if i > 2 and word in PARTIALLY_FILTERED_WORDS:
                continue
            counts[synonym] = counts.get(synonym, 0) + 1
    ranked = [s for s, _ in
              sorted(counts.items(), key=lambda kv: kv[1], reverse=True)]
    if word in PARTIALLY_FILTERED_WORDS:
        ranked = ranked[:2]
    return ranked


def _load_transformers_fill_mask(model_name: str):
    try:
        from transformers import pipeline  # noqa: PLC0415
    except ImportError as e:
        raise ImportError(
            "live synonym expansion needs the 'transformers' package "
            "(absent from this container); pass fill_mask= explicitly "
            "or use the frozen synonyms_table path"
        ) from e
    return pipeline("fill-mask", model=model_name)


class FillMaskSynonyms:
    """Actor-pool batch fn: (word) -> (word, synonyms list<string>).

    ``__init__`` loads the fill-mask model once per actor (T2); each
    batch runs 13 prompts per word through it."""

    def __init__(self, model_name: str = "bert-base-uncased",
                 fill_mask=None):
        self.fill_mask = fill_mask or _load_transformers_fill_mask(model_name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        syns = [synonyms_for_word(w, self.fill_mask) for w in words]
        return pa.table({
            "word": pa.array(words, pa.string()),
            "synonyms": pa.array(syns, pa.list_(pa.string())),
        })


def build_synonyms_table(words, fill_mask=None,
                         model_name: str = "bert-base-uncased",
                         concurrency: int = 2) -> dict[str, list[str]]:
    """{word: [synonyms]} for ``QueryEngine(synonyms_table=...)``.

    ``words`` is a list (driver loop — query vocabularies are tiny) or
    a Ray Dataset with a ``word`` column (actor-pool fan-out for
    corpus-scale vocabulary precomputation)."""
    if isinstance(words, list):
        fm = fill_mask or _load_transformers_fill_mask(model_name)
        return {w: synonyms_for_word(w, fm) for w in words}
    out = words.map_batches(
        FillMaskSynonyms,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"model_name": model_name,
                               "fill_mask": fill_mask},
    ).to_pandas()
    return dict(zip(out["word"], out["synonyms"].map(list)))
