"""Levenshtein edit distance (unit costs, no transposition).

Semantics MUST match DuckDB's ``levenshtein`` exactly — it is the
oracle for the fuzzy-expansion driver gate.  Classic two-row DP with
an optional ``cap``: once every cell of a row exceeds the cap the true
distance must too, so callers expanding a term dictionary
(|dictionary| × probe scans) pay O(cap·min(len)) per rejected term
instead of O(len²).
"""

from __future__ import annotations


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Edit distance between ``a`` and ``b``; if ``cap`` is given and
    the true distance exceeds it, returns ``cap + 1`` (early exit)."""
    if a == b:
        return 0
    # keep b the shorter row
    if len(b) > len(a):
        a, b = b, a
    if cap is not None and len(a) - len(b) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, start=1):
            cost = 0 if ca == cb else 1
            v = min(prev[j] + 1,        # delete from a
                    cur[j - 1] + 1,     # insert into a
                    prev[j - 1] + cost)  # substitute
            cur.append(v)
            if v < row_min:
                row_min = v
        if cap is not None and row_min > cap:
            return cap + 1
        prev = cur
    return prev[-1]
