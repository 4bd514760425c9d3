"""Text-analysis kernels: quality scoring, language ID, token counting,
document fingerprinting.

These are the training-data-pipeline operators (dedup companions) the
100 TB engine needs beyond the reference's own set.  Each is a pure
per-document function; the Ray stages vectorize over batches.  The
SQL-expressible metrics (char/word counts, ratios) are defined to match
DuckDB expressions exactly for the driver's oracle gate.
"""

from __future__ import annotations

import re

from .stopwords import STOPWORDS

_WS_SPLIT_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[a-z0-9]+")
# BPE-ish pre-tokenization: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer pattern family, simplified to ASCII classes).
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# Tiny per-language marker lexicons for the n-gram/stopword language
# heuristic.  Deterministic, self-contained; good enough for routing —
# not a model.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as was at by".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von zu im den".split()),
    "es": frozenset("el la los las de que y en un una es por con para".split()),
    "fr": frozenset("le la les de des et un une est que dans pour sur au".split()),
}


def whitespace_token_count(text: str) -> int:
    """Count of whitespace-separated tokens; SQL-parity:
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty text."""
    stripped = text.strip()
    if not stripped:
        return 0
    return len(_WS_SPLIT_RE.split(stripped))


def bpeish_token_count(text: str) -> int:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return len(_BPEISH_RE.findall(text))


def quality_stats(text: str) -> dict[str, float]:
    """Length / punctuation / stopword quality signals (Gopher-style rules)."""
    n_chars = len(text)
    words = _WORD_RE.findall(text.lower())
    n_words = len(words)
    n_stop = sum(1 for w in words if w in STOPWORDS)
    n_alnum = sum(c.isalnum() for c in text)
    n_space = sum(c.isspace() for c in text)
    n_punct = n_chars - n_alnum - n_space
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
    }


def detect_language(text: str) -> str:
    """Marker-word voting with a CJK codepoint check; 'und' if no signal."""
    if any("一" <= c <= "鿿" for c in text):
        return "zh"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in sorted(_LANG_MARKERS):
        hits = sum(1 for w in words if w in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def word_ngrams(text: str, n: int = 13) -> set[str]:
    """Distinct space-joined word n-grams of ``[a-z0-9]+`` tokens —
    the decontamination unit (GPT-3-style 13-gram overlap checks).
    Docs shorter than ``n`` words have NO n-grams (empty set), matching
    the SQL formulation."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def rolling_fingerprints(text: str, window: int = 8, modulus: int = 1 << 32,
                         base: int = 257, keep_mod: int = 16) -> list[int]:
    """Winnowing-style rolling-hash fingerprints: Rabin-Karp over char
    windows, keeping hashes ≡ 0 (mod keep_mod) — a deterministic sparse
    document sketch for containment checks."""
    if len(text) < window:
        return []
    h = 0
    high = pow(base, window - 1, modulus)
    out = []
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % modulus
        if i >= window:
            h = (h - ord(text[i - window]) * high * base) % modulus
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out


def repetition_stats(text: str) -> dict[str, float]:
    """Within-document repetition signals (Gopher §A1.1, the word-gram
    family — Rae et al. 2021, arXiv:2112.11446).

    - ``top_2gram_char_frac`` / ``top_3gram_char_frac``: max over the
      doc's word n-grams of ``occurrences × gram_chars`` (gram chars =
      summed word lengths, no separators) divided by total word chars.
      The product-max form is tie-free, so Ray and SQL agree without a
      tie-break rule.
    - ``dup_5gram_char_frac``: fraction of word characters covered by
      at least one 5-gram that occurs ≥2× in the SAME doc (coverage
      counts each word position once however many duplicate grams
      overlap it — the Gopher "characters in duplicate n-grams"
      measure).

    Words are the SQL-parity kernel (``[a-z0-9]+`` over lower(text)).
    Gopher's duplicate line/paragraph fractions are deliberately not
    here: the synthetic corpus has no line structure, so they would be
    identically zero (vacuous for the oracle gate); the n-gram family
    carries the same signal on running text.
    """
    words = _WORD_RE.findall(text.lower())
    n = len(words)
    lens = [len(w) for w in words]
    word_chars = sum(lens)
    out = {"top_2gram_char_frac": 0.0, "top_3gram_char_frac": 0.0,
           "dup_5gram_char_frac": 0.0}
    if word_chars == 0:
        return out
    # prefix sums: gram chars of words[i:i+k] = pref[i+k] - pref[i]
    pref = [0]
    for ln in lens:
        pref.append(pref[-1] + ln)

    for key, k in (("top_2gram_char_frac", 2), ("top_3gram_char_frac", 3)):
        if n < k:
            continue
        counts: dict[tuple[str, ...], int] = {}
        for i in range(n - k + 1):
            g = tuple(words[i:i + k])
            counts[g] = counts.get(g, 0) + 1
        best = 0
        for i in range(n - k + 1):
            g = tuple(words[i:i + k])
            score = counts[g] * (pref[i + k] - pref[i])
            if score > best:
                best = score
        out[key] = best / word_chars

    k = 5
    if n >= k:
        counts5: dict[tuple[str, ...], int] = {}
        for i in range(n - k + 1):
            g = tuple(words[i:i + k])
            counts5[g] = counts5.get(g, 0) + 1
        covered = bytearray(n)
        for i in range(n - k + 1):
            if counts5[tuple(words[i:i + k])] >= 2:
                covered[i:i + k] = b"\x01" * k
        dup_chars = sum(ln for ln, c in zip(lens, covered) if c)
        out["dup_5gram_char_frac"] = dup_chars / word_chars
    return out
