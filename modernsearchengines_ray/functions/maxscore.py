"""MaxScore: exact disjunctive top-k with non-essential-list skipping.

Standard algorithm (Turtle & Flood 1995, "Query evaluation: strategies
and optimizations"; the DAAT formulation in Mallia et al. 2019) over
the same cursor layout block-max WAND uses (functions/wand.py): once
the running threshold θ exceeds the summed max-scores of the cheapest
lists, those lists become NON-ESSENTIAL — no document can enter the
top-k on their strength alone, so candidates are generated from the
essential lists only and the non-essential ones are merely probed,
cheapest last, with an upper-bound early exit per document.

The kernel is EXACT and returns bit-identical scores to wand_topk /
the exhaustive accumulator: matched contributions are re-summed in
canonical term (input-row) order before any heap comparison, so the
per-doc FP addition order never depends on the max-score ordering or
the physical segment layout (same invariant wand.py documents).

Complements WAND rather than replacing it.  MaxScore needs no block
metadata at all (only the static per-list max), so it keeps serving
when blocks are absent or stale; its candidate loop also never
re-sorts lists per doc (the max-score order is static, computed
once).  Measured on THIS index's per-posting-BM25 layout, block-max
WAND still wins every query mix (sf0.1, 4 scorers, best-of-5 p50:
44 vs 76 ms short/high-df, 100 vs 162 ms 8-term, 111 vs 167 ms
rare+stopword skew — BASELINE.md round-5 notes), because the stored
block maxima are tight — so WAND remains the serving default and
``algo="maxscore"`` is the explicitly-selected alternative.
pipelines/query.py exposes both through ``ShardScorer.topk_bm25
(algo=...)`` and the exactness gate (`maxscore_search` driver entry)
pins both to the exhaustive scan and to each other.
"""

from __future__ import annotations

import heapq

import numpy as np

from .wand import _Cursor, make_cursors  # noqa: F401  (shared layout)

_SENTINEL = 1 << 62


def _canonical_sum(pairs: list[tuple[int, float]]) -> float:
    """Sequential FP sum in term (input-row) order — the one true
    per-doc addition order shared with wand_topk and _accumulate."""
    pairs.sort()
    total = 0.0
    for _, s in pairs:
        total += s
    return total


def maxscore_topk(
    cursors: list[_Cursor],
    k: int,
    initial_threshold: float = 0.0,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact top-k (score desc, doc id asc) over the cursors' union.

    Returns (hits, stats); stats counts fully-scored docs, docs pruned
    by the non-essential upper bound, and the deepest non-essential
    prefix reached — tests assert the skipping actually fires."""
    heap: list[tuple[float, int]] = []      # (score, -doc) min-heap
    threshold = initial_threshold
    stats = {"scored": 0, "skipped_docs": 0, "nonessential_max": 0}

    # cheapest lists first; order tiebreak keeps the sort (and so the
    # probe sequence) deterministic across runs and layouts.  Max
    # scores are static, so the ordering and the prefix bounds are
    # computed ONCE; only the essential boundary m moves with θ.
    # Exhausted cursors stay in place (doc() = sentinel) — their
    # max-score keeps the bounds merely looser, never wrong.
    live = sorted((c for c in cursors if not c.exhausted()),
                  key=lambda c: (c.max_score, c.order))
    if not live:
        return [], stats
    prefix = np.cumsum([c.max_score for c in live])
    total = float(prefix[-1])

    def _boundary() -> int:
        """First essential index: the longest prefix of cheap lists
        whose combined max-score cannot reach θ is skippable."""
        return int(np.searchsorted(prefix, threshold, side="right"))

    m = stats["nonessential_max"] = _boundary()
    while total > threshold:
        d = _SENTINEL
        for c in live[m:]:
            cd = c.doc()
            if cd < d:
                d = cd
        if d == _SENTINEL:
            # essential lists drained: every remaining doc lives only
            # in non-essential lists, provably <= θ
            break
        pairs: list[tuple[int, float]] = []
        for c in live[m:]:
            if c.doc() == d:
                pairs.append((c.order, float(c.scores[c.pos])))
                c.pos += 1                   # consumed either way
        # probe non-essential lists, LARGEST max-score first, with the
        # canonical partial sum + remaining-prefix bound as early exit
        cur = _canonical_sum(pairs)
        pruned = False
        for i in range(m - 1, -1, -1):
            if cur + float(prefix[i]) <= threshold:
                pruned = True
                break
            c = live[i]
            c.seek(d)
            if c.doc() == d:
                pairs.append((c.order, float(c.scores[c.pos])))
                cur = _canonical_sum(pairs)
        if pruned:
            stats["skipped_docs"] += 1
            continue
        stats["scored"] += 1
        entry = (cur, -d)
        if len(heap) < k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)
        if len(heap) == k and heap[0][0] != threshold:
            threshold = heap[0][0]
            m = _boundary()
            if m > stats["nonessential_max"]:
                stats["nonessential_max"] = m
    hits = sorted(((-doc, s) for s, doc in heap),
                  key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in hits], stats
