"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
small-range correction) — mergeable, fixed-size, deterministic.

The distributed pattern: each ``map_batches`` task folds its batch into
one sketch and emits the register array (one row per batch); sketches
merge by elementwise max — associative and commutative, so partial
merging needs no shuffle at all (the registers ARE the partial
aggregate).  At p=14 the standard error is ~0.81% with 16 KiB per
sketch.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(value) -> int:
        data = value if isinstance(value, bytes) else str(value).encode()
        return int.from_bytes(hashlib.md5(data).digest()[:8], "little")

    def add(self, value) -> None:
        h = self._hash64(value)
        idx = h & (self.m - 1)
        rest = h >> self.p
        # rank = position of the first 1-bit in the remaining 64-p bits
        rank = (64 - self.p) - rest.bit_length() + 1 if rest else 64 - self.p + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @classmethod
    def from_registers(cls, registers: np.ndarray, p: int = 14):
        sketch = cls(p)
        sketch.registers = np.asarray(registers, dtype=np.uint8).copy()
        return sketch

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv_sum = np.sum(np.exp2(-self.registers.astype(np.float64)))
        raw = alpha * m * m / inv_sum
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)   # linear counting
        return float(raw)
