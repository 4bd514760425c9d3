"""Proximity score — exact replica of the reference's heap sweep.

/root/reference/retrieval.py:177-209.  The semantics are replicated
verbatim *including the early break*: the sweep stops as soon as any
position list is exhausted (the reference ``break``s out of the while
loop rather than continuing with the remaining lists), and
``current_max`` only grows.  Span is normalized by the number of lists
(including any empty ones) and inverted.
"""

from __future__ import annotations

import heapq


def calculate_proximity_score(proximity_lists: list) -> float:
    if len(proximity_lists) <= 1:
        return 0.0

    heap = [
        (positions[0], i, 0)
        for i, positions in enumerate(proximity_lists)
        if len(positions)
    ]
    heapq.heapify(heap)
    if not heap:
        return 0.0

    current_max = max(positions[0] for positions in proximity_lists if len(positions))
    min_span = float("inf")

    while heap:
        current_min, list_idx, pos_idx = heapq.heappop(heap)
        min_span = min(min_span, current_max - current_min + 1)
        if pos_idx + 1 < len(proximity_lists[list_idx]):
            next_pos = proximity_lists[list_idx][pos_idx + 1]
            heapq.heappush(heap, (next_pos, list_idx, pos_idx + 1))
            current_max = max(current_max, next_pos)
        else:
            break

    normalized_span = min_span / len(proximity_lists)
    return 1.0 / normalized_span if normalized_span > 0 else 0.0
