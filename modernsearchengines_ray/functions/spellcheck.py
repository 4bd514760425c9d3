"""Spellcheck (reference M17, retrieval.py:333-359).

The reference wraps pyspellchecker: keep in-dictionary words, else the
most-frequent candidate within edit distance 1 then 2, with an EN then
DE dictionary fallback and "tübingen"/"tuebingen" whitelisted.
:class:`TwoStageSpellChecker` replicates that EN->DE control flow over
pluggable dictionaries; :meth:`TwoStageSpellChecker.from_pyspellchecker`
uses the reference's exact bundled frequency lists when the package is
installed (it is not in this container, so the corpus-derived path is
the default).  :class:`SpellChecker` is the standard Norvig corrector
over a {word: frequency} dictionary — the built index's (term, df)
table is exactly such a dictionary, so serving reuses the index as its
spelling model (no second corpus pass); the dictionary source is the
documented divergence from the reference's bundled lists.
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

    def __contains__(self, word: str) -> bool:
        return word.lower() in self.freq

    def correction_or_none(self, word: str) -> str | None:
        """Best edit-1 then edit-2 candidate, or None when the
        dictionary offers nothing (pyspellchecker's ``correction``
        returns None in that case — the EN->DE fallback keys on it)."""
        w = word.lower()
        if w in self.freq:
            return word
        for candidates in (self._known(_edits1(w)),
                           self._known(e2 for e1 in _edits1(w)
                                       for e2 in _edits1(e1))):
            if candidates:
                # max frequency, ties alphabetical (deterministic)
                return max(sorted(candidates), key=lambda c: self.freq[c])
        return None

    def correction(self, word: str) -> str:
        corrected = self.correction_or_none(word)
        return word if corrected is None else corrected

    def correct_query(self, query: str) -> str:
        """Reference spellcheck(): per whitespace word, keep or correct
        (retrieval.py:344-358)."""
        return " ".join(self.correction(w) for w in query.split())


class TwoStageSpellChecker:
    """The reference's EN-then-DE corrector (retrieval.py:333-359):
    keep in-EN-dictionary words verbatim; otherwise the EN correction;
    when EN offers none, the DE correction; when both fail, the word
    itself.  Both dictionaries whitelist tübingen/tuebingen.

    Dictionaries are any :class:`SpellChecker`-shaped objects
    (``__contains__`` + ``correction_or_none``) — corpus-derived Norvig
    dictionaries here, pyspellchecker's bundled EN/DE frequency lists
    via :meth:`from_pyspellchecker` on a host that has the package."""

    def __init__(self, primary: SpellChecker, secondary: SpellChecker):
        self.primary = primary
        self.secondary = secondary

    @classmethod
    def from_pyspellchecker(cls) -> "TwoStageSpellChecker":
        """Reference-exact dictionaries — requires ``pyspellchecker``
        (absent from this container; raises ImportError with guidance)."""
        try:
            from spellchecker import SpellChecker as PySpell  # noqa: PLC0415
        except ImportError as e:
            raise ImportError(
                "pyspellchecker is not installed; build the corrector "
                "from corpus dictionaries (SpellChecker.from_index) or "
                "install pyspellchecker for the reference's bundled "
                "EN/DE frequency lists"
            ) from e
        en, de = PySpell(), PySpell(language="de")
        en.word_frequency.load_words(WHITELIST)
        de.word_frequency.load_words(WHITELIST)

        class _Wrap:
            def __init__(self, spell):
                self.spell = spell

            def __contains__(self, word):
                return word in self.spell

            def correction_or_none(self, word):
                return self.spell.correction(word)

        return cls(_Wrap(en), _Wrap(de))

    def correction(self, word: str) -> str:
        if word in self.primary:
            return word
        corrected = self.primary.correction_or_none(word)
        if corrected is None:
            corrected = self.secondary.correction_or_none(word)
        return word if corrected is None else corrected

    def correct_query(self, query: str) -> str:
        return " ".join(self.correction(w) for w in query.split())
