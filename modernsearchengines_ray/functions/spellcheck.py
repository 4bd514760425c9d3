"""Spellcheck (reference M17, retrieval.py:333-359).

The reference wraps pyspellchecker: keep in-dictionary words, else the
most-frequent candidate within edit distance 1 then 2, with an EN then
DE dictionary fallback and "tübingen"/"tuebingen" whitelisted.
pyspellchecker (and its bundled frequency dictionaries) is not in this
container, so this is the standard Norvig corrector over a
CORPUS-DERIVED frequency dictionary — the built index's (term, df)
table is exactly such a dictionary, so serving reuses the index as its
spelling model (no second corpus pass).  Semantics match the reference
contract (dictionary hit -> unchanged; else best edit-1, else edit-2,
else the word itself); the dictionary source is the documented
divergence.
"""

from __future__ import annotations

_ALPHABET = "abcdefghijklmnopqrstuvwxyzäöüß"

WHITELIST = ("tübingen", "tuebingen")


def _edits1(word: str) -> set[str]:
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [a + b[1:] for a, b in splits if b]
    transposes = [a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1]
    replaces = [a + c + b[1:] for a, b in splits if b for c in _ALPHABET]
    inserts = [a + c + b for a, b in splits for c in _ALPHABET]
    return set(deletes + transposes + replaces + inserts)


class SpellChecker:
    """Norvig corrector over a {word: frequency} dictionary."""

    def __init__(self, frequencies: dict[str, int]):
        self.freq = dict(frequencies)
        for word in WHITELIST:
            self.freq.setdefault(word, 1)

    @classmethod
    def from_index(cls, index_dir: str) -> "SpellChecker":
        """Build the dictionary from the inverted index's (term, df)."""
        import pyarrow.parquet as pq

        from ..state.shards import list_shard_files

        freq: dict[str, int] = {}
        for path in list_shard_files(index_dir):
            table = pq.read_table(path, columns=["term", "df"])
            for term, df in zip(table["term"].to_pylist(),
                                table["df"].to_pylist()):
                freq[term] = freq.get(term, 0) + int(df)
        return cls(freq)

    def _known(self, words) -> set[str]:
        return {w for w in words if w in self.freq}

    def correction(self, word: str) -> str:
        w = word.lower()
        if w in self.freq:
            return word
        for candidates in (self._known(_edits1(w)),
                           self._known(e2 for e1 in _edits1(w)
                                       for e2 in _edits1(e1))):
            if candidates:
                # max frequency, ties alphabetical (deterministic)
                return max(sorted(candidates), key=lambda c: self.freq[c])
        return word

    def correct_query(self, query: str) -> str:
        """Reference spellcheck(): per whitespace word, keep or correct
        (retrieval.py:344-358)."""
        return " ".join(self.correction(w) for w in query.split())
