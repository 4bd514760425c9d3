"""BM25 scoring — formulas verbatim from the reference.

- idf = log((N - df + 0.5) / (df + 0.5) + 1)          (indexing.py:216-217)
- bm25 = idf * tf*(k+1) / (tf + k*(1 - b + b*norm))   (indexing.py:162-171)
  with k=1.5, b=0.75 and norm = doc_len / avg_doc_len.

⚠ Reference length-norm quirk (SURVEY.md §2.5 A4): ``doc_len`` is the
document's **token** count (indexing.py:207-208) while ``avg_doc_len``
is a mean **character** length of ``url_words + " " + text``
(indexing.py:183,193-200) whose divisor counts ALL docs (including the
>800k-char skipped ones) but whose numerator EXCLUDES the skipped
docs' characters — skipped docs dilute the average without
contributing chars (stages/stats.py states the same).  We replicate it
verbatim — never "fix" it — by feeding those exact quantities in from
the corpus-stats stage.
"""

from __future__ import annotations

import numpy as np


def idf(num_documents: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log((num_documents - np.asarray(df, dtype=np.float64) + 0.5)
                  / (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)


def bm25_score(
    idf_value: np.ndarray | float,
    tf: np.ndarray | int,
    doc_len: np.ndarray | float,
    avg_doc_len: float,
    k1: float = 1.5,
    b: float = 0.75,
) -> np.ndarray | float:
    tf = np.asarray(tf, dtype=np.float64)
    norm = np.asarray(doc_len, dtype=np.float64) / avg_doc_len
    return idf_value * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * norm))
