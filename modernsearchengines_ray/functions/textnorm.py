"""Text normalization chain — exact reference semantics.

Replicates, in order, the per-chunk normalization the reference applies
before tokenizing (/root/reference/indexing.py:130-144), plus the url
helpers it prepends/applies:

- url_to_comma_separated_words  (indexing.py:89-105)
- convert_umlaute               (indexing.py:107-116)
- substitute_dots_in_urls       (indexing.py:118-124)
- the order-sensitive regex chain (indexing.py:136-144)
- split_text 800k chunking      (indexing.py:126-128)

All regexes are compiled at module import (once per worker process).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

_URL_SPLIT_RE = re.compile(r"[./\-]+")
_IN_TEXT_URL_RE = re.compile(r"\b(?:https?://|www\.)[^\s]+\.[^\s]+\b")
_NUM_PAREN_RE = re.compile(r"(\d+)\)")
_NUM_COMMA_RE = re.compile(r"(\d+),(\d+)")
_ORDINAL_RE = re.compile(r"(\d+)(st|nd|rd|th)")
_SEP_RUN_RE = re.compile(r"[\/\\_\-\–\+]+")
_DOTTED_WORD_RE = re.compile(r"(\b\w+)\.(\w+\b)")
_WS_RUN_RE = re.compile(r"\s+")

_UMLAUTS = (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss"))


def url_to_comma_separated_words(url: str) -> str:
    """Domain+path split on [./-]+ joined with ", " (indexing.py:89-105)."""
    parsed = urlparse(url)
    domain = parsed.netloc
    if domain.startswith("www."):
        domain = domain[4:]
    words = [w for w in _URL_SPLIT_RE.split(domain + parsed.path) if w]
    return ", ".join(words)


def convert_umlaute(text: str) -> str:
    for umlaut, repl in _UMLAUTS:
        text = text.replace(umlaut, repl)
    return text


def substitute_dots_in_urls(text: str) -> str:
    """Replace '.' with ' ' inside in-text URLs (indexing.py:118-124)."""
    return _IN_TEXT_URL_RE.sub(lambda m: m.group(0).replace(".", " "), text)


def split_text(text: str, max_length: int):
    for i in range(0, len(text), max_length):
        yield text[i : i + max_length]


def normalize_chunk(chunk: str) -> str:
    """The order-sensitive chain of indexing.py:136-144, verbatim semantics."""
    chunk = convert_umlaute(chunk.lower())
    chunk = substitute_dots_in_urls(chunk)
    chunk = _NUM_PAREN_RE.sub(r"\1", chunk)
    chunk = _NUM_COMMA_RE.sub(r"\1\2", chunk)
    chunk = _ORDINAL_RE.sub(r"\1", chunk)
    chunk = _SEP_RUN_RE.sub(" ", chunk)
    chunk = _DOTTED_WORD_RE.sub(r"\1 \2", chunk)
    chunk = chunk.replace("\t", " ").replace("\n", " ").replace("\r", " ")
    chunk = _WS_RUN_RE.sub(" ", chunk).strip()
    return chunk
