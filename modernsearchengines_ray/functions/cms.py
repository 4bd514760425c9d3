"""Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable,
fixed-size, deterministic frequency estimator.

Same distributed pattern as the HLL sketch (functions/hll.py): each
``map_batches`` task folds its batch into one sketch and emits the
count matrix; sketches merge by elementwise ADD — associative and
commutative, so the matrices ARE the partial aggregate and no shuffle
is needed.  Guarantees: estimate >= true count always (counts only
ever add), and estimate <= true + (e/width)·N with probability
>= 1 - e^-depth per query, N = total insertions.
"""

from __future__ import annotations

import hashlib

import numpy as np


class CountMinSketch:
    def __init__(self, width: int = 2048, depth: int = 4):
        if not 1 <= depth <= 4:
            raise ValueError("depth must be 1..4 (md5 yields 4 u32 slices)")
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _rows(self, value) -> np.ndarray:
        """One column index per row, derived from independent slices
        of a single md5 (deterministic across processes/machines)."""
        data = value if isinstance(value, bytes) else str(value).encode()
        digest = hashlib.md5(data).digest()
        return np.frombuffer(digest, dtype="<u4")[:self.depth] % self.width

    def add(self, value, count: int = 1) -> None:
        idx = self._rows(value)
        self.counts[np.arange(self.depth), idx] += count

    def add_counts(self, pairs) -> None:
        """Fold ``(value, count)`` pairs (e.g. a batch Counter) —
        one hash per DISTINCT value, not per occurrence."""
        for value, count in pairs:
            self.add(value, count)

    def estimate(self, value) -> int:
        idx = self._rows(value)
        return int(self.counts[np.arange(self.depth), idx].min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.counts += other.counts
        return self

    @classmethod
    def from_counts(cls, counts: np.ndarray,
                    width: int = 2048, depth: int = 4):
        sketch = cls(width, depth)
        sketch.counts = np.asarray(counts, dtype=np.int64) \
            .reshape(depth, width)
        return sketch

    @property
    def total(self) -> int:
        """N = total insertions (any row sums to it)."""
        return int(self.counts[0].sum())
