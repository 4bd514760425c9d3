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

Complements WAND rather than replacing it: MaxScore degrades more
gracefully on long queries (no per-doc pivot re-sort over all lists;
candidate generation touches only the essential suffix) while BMW
wins when block metadata is tight.  pipelines/query.py exposes both
through ``ShardScorer.topk_bm25(algo=...)`` and the exactness gate
(`maxscore_search` driver entry) pins them to the exhaustive scan.
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

    live = [c for c in cursors if not c.exhausted()]
    while True:
        live = [c for c in live if not c.exhausted()]
        if not live:
            break
        # cheapest lists first; order tiebreak keeps the sort (and so
        # the probe sequence) deterministic across runs and layouts
        live.sort(key=lambda c: (c.max_score, c.order))
        prefix = np.cumsum([c.max_score for c in live])
        if prefix[-1] <= threshold:
            break                            # nobody can beat θ
        # first essential index: the shortest prefix of cheap lists
        # whose combined max-score still cannot reach θ is skippable
        m = int(np.searchsorted(prefix, threshold, side="right"))
        if m > stats["nonessential_max"]:
            stats["nonessential_max"] = m
        essential = live[m:]
        d = min(c.doc() for c in essential)
        pairs: list[tuple[int, float]] = []
        for c in essential:
            if c.doc() == d:
                pairs.append((c.order, float(c.scores[c.pos])))
                c.pos += 1                   # consumed either way
        # probe non-essential lists, LARGEST max-score first, with the
        # canonical partial sum + remaining-prefix bound as early exit
        pruned = False
        for i in range(m - 1, -1, -1):
            if _canonical_sum(pairs) + float(prefix[i]) <= threshold:
                pruned = True
                break
            c = live[i]
            c.seek(d)
            if c.doc() == d:
                pairs.append((c.order, float(c.scores[c.pos])))
        if pruned:
            stats["skipped_docs"] += 1
            continue
        score = _canonical_sum(pairs)
        stats["scored"] += 1
        entry = (score, -d)
        if len(heap) < k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)
        if len(heap) == k:
            threshold = heap[0][0]
    hits = sorted(((-doc, s) for s, doc in heap),
                  key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in hits], stats
