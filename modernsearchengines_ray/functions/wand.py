"""Block-max WAND: exact disjunctive top-k with block skipping.

Standard algorithm (Broder et al. 2003 WAND; Ding & Suel 2011 block-max
variant) over our segmented posting layout: each (term, segment) is one
sorted cursor; per-cursor block metadata (first doc id + max score per
block) gives the upper bounds.  The kernel is EXACT — pruning only
skips docs provably unable to reach the current top-k threshold.

Used scorer-locally (a term-sharded scorer owns the complete posting
list of every term it serves, so its local top-k over its terms is
exact); the cross-shard merge strategy lives in pipelines/query.py.
"""

from __future__ import annotations

import heapq

import numpy as np


class _Cursor:
    """One sorted posting segment with block-max metadata."""

    __slots__ = ("doc_ids", "scores", "block_first", "block_max",
                 "block_size", "pos", "max_score", "order")

    def __init__(self, doc_ids: np.ndarray, scores: np.ndarray,
                 block_first: np.ndarray, block_max: np.ndarray,
                 block_size: int, order: int = 0):
        self.doc_ids = doc_ids
        self.scores = scores
        self.block_first = block_first
        self.block_max = block_max
        self.block_size = block_size
        self.pos = 0
        self.max_score = float(block_max.max()) if len(block_max) else 0.0
        self.order = order

    def doc(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < len(self.doc_ids) \
            else 1 << 62

    def exhausted(self) -> bool:
        return self.pos >= len(self.doc_ids)

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (galloping via searchsorted)."""
        if self.pos >= len(self.doc_ids):
            return
        self.pos += int(np.searchsorted(self.doc_ids[self.pos:], target))

    def current_block_max(self) -> float:
        block = self.pos // self.block_size
        return float(self.block_max[min(block, len(self.block_max) - 1)])

    def next_block_first(self) -> int:
        """First doc id of the next block (or sentinel)."""
        block = self.pos // self.block_size + 1
        if block < len(self.block_first):
            return int(self.block_first[block])
        return 1 << 62


def wand_topk(
    cursors: list[_Cursor],
    k: int,
    initial_threshold: float = 0.0,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact top-k (score desc, doc id asc) over the cursors' union.

    Returns (hits, stats) where stats counts scored vs skipped docs —
    tests assert the pruning actually fires."""
    heap: list[tuple[float, int]] = []      # (score, -doc) min-heap
    threshold = initial_threshold
    scored = 0
    stats = {"scored": 0, "block_skips": 0}

    live = [c for c in cursors if not c.exhausted()]
    while live:
        live = [c for c in live if not c.exhausted()]
        if not live:
            break
        live.sort(key=lambda c: c.doc())
        # pivot: first cursor where the prefix max-score sum reaches θ
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.max_score
            if acc > threshold:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break                            # nobody can beat θ
        pivot_doc = live[pivot_idx].doc()
        if live[0].doc() == pivot_doc:
            # block-max refinement: tighter bound from current blocks
            block_bound = 0.0
            for c in live:
                if c.doc() > pivot_doc:
                    break
                block_bound += c.current_block_max()
            if block_bound <= threshold:
                # BMW skip: the bound covers docs only while no further
                # cursor joins, so jump to min(next block boundaries of
                # the leading cursors, next cursor's current doc)
                stats["block_skips"] += 1
                nxt = (live[pivot_idx + 1].doc()
                       if pivot_idx + 1 < len(live) else 1 << 62)
                target = min(
                    min((c.next_block_first() for c in live
                         if c.doc() <= pivot_doc), default=1 << 62),
                    nxt,
                )
                target = max(target, pivot_doc + 1)
                for c in live:
                    if c.doc() <= pivot_doc:
                        c.seek(target)
                continue
            # sum contributions in input-row (term) order, NOT live-list
            # order: ties in the doc-sorted live list resolve by advance
            # history, so the FP addition order would depend on the
            # physical segment layout.  Canonical term order keeps the
            # per-doc sum bit-identical across layouts (e.g. before vs
            # after compaction) and matches _accumulate's term-major sum.
            matched = []
            for c in live:
                if c.doc() != pivot_doc:
                    break
                matched.append((c.order, float(c.scores[c.pos])))
                c.pos += 1
            matched.sort()
            score = 0.0
            for _, s in matched:
                score += s
            stats["scored"] += 1
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            if len(heap) == k:
                threshold = heap[0][0]
        else:
            # align the leading cursors onto the pivot doc
            for c in live:
                if c.doc() >= pivot_doc:
                    break
                c.seek(pivot_doc)
    hits = sorted(((-d, s) for s, d in heap),
                  key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in hits], stats


def make_cursors(
    term_rows: list[dict],
    block_size: int,
) -> list[_Cursor]:
    """Build cursors from decoded term rows: each row carries doc_ids,
    scores (both flat, per-segment sorted), seg_lens, block_first_doc,
    block_max_bm25 (blocks never span segments)."""
    cursors = []
    for row_idx, row in enumerate(term_rows):
        seg_lens = np.asarray(row["seg_lens"], dtype=np.int64)
        doc_ids = row["doc_ids"]
        scores = row["bm25"]
        block_first = np.asarray(row["block_first_doc"], dtype=np.int64)
        block_max = np.asarray(row["block_max_bm25"], dtype=np.float64)
        off = 0
        boff = 0
        for sl in seg_lens:
            sl = int(sl)
            nb = (sl + block_size - 1) // block_size
            cursors.append(_Cursor(
                doc_ids[off : off + sl],
                scores[off : off + sl],
                block_first[boff : boff + nb],
                block_max[boff : boff + nb],
                block_size,
                order=row_idx,
            ))
            off += sl
            boff += nb
    return cursors
