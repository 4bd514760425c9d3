"""Snippet extraction (reference M21, retrieval.py:376-404).

Per top-k hit: sentence-split the document, fit TF-IDF over the
sentences + the query, return the argmax-cosine sentence.  Pure
per-result function — it runs as a tiny ``map`` over the <=10 final
hits (SURVEY.md §2.2 M21), never over the corpus.

Divergences from the reference, pinned here because the exact
libraries are not in this container:
- sentence split: regex splitter instead of NLTK punkt
  (sent_tokenize, retrieval.py:385) — boundary behaviour differs on
  abbreviations; the contract (argmax-cosine sentence of the split)
  is identical;
- TF-IDF: from-scratch implementation of sklearn's default formula
  (smooth idf ln((1+n)/(1+df))+1, l2 row norm, token pattern
  ``(?u)\\b\\w\\w+\\b`` — TfidfVectorizer defaults, retrieval.py:391).
"""

from __future__ import annotations

import re

import numpy as np

#: sklearn TfidfVectorizer's default token_pattern
_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")
#: sentence boundary: terminator(s) + whitespace
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def sent_split(text: str) -> list[str]:
    parts = [s.strip() for s in _SENT_RE.split(text)]
    return [s for s in parts if s]


def _tfidf_matrix(docs: list[str]) -> np.ndarray:
    """Rows = l2-normalized tf-idf vectors (sklearn default formula)."""
    tokenized = [
        [t.lower() for t in _TOKEN_RE.findall(doc)] for doc in docs
    ]
    vocab: dict[str, int] = {}
    for tokens in tokenized:
        for t in tokens:
            if t not in vocab:
                vocab[t] = len(vocab)
    n, v = len(docs), len(vocab)
    if v == 0:
        return np.zeros((n, 1))
    tf = np.zeros((n, v))
    for i, tokens in enumerate(tokenized):
        for t in tokens:
            tf[i, vocab[t]] += 1.0
    df = (tf > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    mat = tf * idf[None, :]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def get_relevant_snippet(query: str, document: str) -> str:
    """The argmax-cosine sentence (retrieval.py:376-404 semantics)."""
    if not document:
        return "Document not found."
    sentences = sent_split(document)
    if not sentences:
        return document
    if len(sentences) == 1:
        return sentences[0]
    mat = _tfidf_matrix(sentences + [query])
    sims = mat[:-1] @ mat[-1]
    return sentences[int(np.argmax(sims))]
