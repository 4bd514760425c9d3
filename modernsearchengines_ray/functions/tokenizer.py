"""Tokenize/normalize pipeline — the engine's (and oracle's) term pipeline.

Reference semantics (/root/reference/indexing.py:130-159): split the raw
text into 800,000-char chunks; per chunk run the normalization chain,
then tokenize, drop stopwords and punctuation, lemmatize+Porter-stem,
and emit ``(stem, char_offset)`` pairs where the offset is within the
*normalized chunk* (so offsets restart every chunk).

Deviation (documented): the reference tokenizes with spaCy
``en_core_web_sm`` and lemmatizes before stemming; spaCy is not
available in this environment, so tokens are unicode word-character
runs (``\\w+`` minus underscores, which the normalizer already removed)
and the lemma step is a pluggable LOOKUP TABLE applied in spaCy's
position (after the stopword drop, before Porter) —
``lemma_table=None`` (the default, and what the conformance suite
pins) is the identity; pass
:data:`modernsearchengines_ray.functions.lemma.DEFAULT_LEMMA_TABLE`
(vendored irregular forms) or a loaded spacy-lookups-data table for
spaCy-shaped lemmatization (see functions/lemma.py for the remaining
divergences).  Stopword and punctuation drops keep the same position
in the pipeline; the sequential oracle shares this module, so
engine-vs-oracle conformance is exact for any table.
"""

from __future__ import annotations

import re

from .porter import porter_stem
from .stopwords import STOPWORDS
from .textnorm import normalize_chunk, split_text

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

#: memoized stem cache — Zipf makes this extremely effective; bounded by
#: vocabulary size which is tiny relative to token count.  Filled inline
#: in the tokenize hot loop.
_STEM_CACHE: dict[str, str] = {}

#: per-lemma-table stem caches: id(table) -> (table, {token: stem}).
#: The table itself is kept alongside so a recycled id() can never
#: serve another table's cache.
_LEMMA_STEM_CACHES: dict[int, tuple[dict, dict[str, str]]] = {}


def _stem_cache_for(lemma_table: dict[str, str] | None) -> dict[str, str]:
    if lemma_table is None:
        return _STEM_CACHE
    key = id(lemma_table)
    entry = _LEMMA_STEM_CACHES.get(key)
    if entry is None or entry[0] is not lemma_table:
        entry = _LEMMA_STEM_CACHES[key] = (lemma_table, {})
    return entry[1]


def tokenize(
    text: str,
    only_unique_tokens: bool = False,
    chunk_chars: int = 800_000,
    lemma_table: dict[str, str] | None = None,
) -> list[tuple[str, int]]:
    """Return [(stem, char_offset_in_normalized_chunk), ...].

    ``only_unique_tokens`` keeps the first occurrence of each stem
    (reference indexing.py:152-156, used on the query side).
    ``lemma_table`` maps surface form -> lemma before stemming
    (reference indexing.py:148-151 spaCy lemma position); None = identity.
    """
    unique: set[str] = set()
    tokens: list[tuple[str, int]] = []

    # hot loop: locals bound once (measured ~20% of corpus CPU here)
    stop = STOPWORDS
    cache = _stem_cache_for(lemma_table)
    lemma_get = lemma_table.get if lemma_table is not None else None
    cache_get = cache.get
    out_append = tokens.append
    finditer = _TOKEN_RE.finditer

    for chunk in split_text(text, chunk_chars):
        chunk = normalize_chunk(chunk)
        for match in finditer(chunk):
            token = match.group()
            if token in stop:
                continue
            stem = cache_get(token)
            if stem is None:
                base = token if lemma_get is None else lemma_get(token, token)
                stem = cache[token] = porter_stem(base)
            if not stem:
                continue
            if only_unique_tokens:
                if stem in unique:
                    continue
                unique.add(stem)
            out_append((stem, match.start()))

    return tokens


def tokenize_terms(text: str) -> list[str]:
    """Just the stems, document order (convenience for stats/topics)."""
    return [t for t, _ in tokenize(text)]
