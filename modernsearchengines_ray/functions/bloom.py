"""Bloom filter (Bloom 1970) — fixed-size set-membership sketch.

The scale path for broadcast membership tests (decontamination probe
sets, stop-lists, seen-URL tables): an exact set of 10⁹ 13-gram
strings is ~100 GB; a Bloom filter at 1% FPR is ~1.2 GB and ships via
one ``ray.put``.  NO false negatives ever (a contaminated document is
never missed); false positives occur at rate ~(1-e^{-kn/m})^k, so
positives either pass through a small exact re-check or are accepted
as over-flagging, caller's choice.

Deterministic double hashing (Kirsch & Mitzenmacher 2006): the i-th
probe is ``h1 + i·h2 mod m`` with h1/h2 from one md5, so filters built
on different machines are bit-identical and OR-mergeable.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 7):
        if num_bits <= 0 or num_hashes <= 0:
            raise ValueError("num_bits and num_hashes must be positive")
        self.m = num_bits
        self.k = num_hashes
        self.bits = np.zeros((num_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        """Size for ``n`` items at target false-positive rate."""
        m = max(8, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
        k = max(1, round(m / max(n, 1) * math.log(2)))
        return cls(m, k)

    def _probes(self, value) -> np.ndarray:
        data = value if isinstance(value, bytes) else str(value).encode()
        digest = hashlib.md5(data).digest()
        h1 = int.from_bytes(digest[:8], "little")
        h2 = int.from_bytes(digest[8:], "little") | 1  # odd → full cycle
        return (h1 + np.arange(self.k, dtype=np.uint64) * h2) % self.m

    def add(self, value) -> None:
        idx = self._probes(value)
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.uint8(1) << (idx & 7).astype(np.uint8))

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def __contains__(self, value) -> bool:
        idx = self._probes(value)
        return bool(np.all(
            (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.k) == (other.m, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    @classmethod
    def from_bits(cls, bits: np.ndarray, num_bits: int,
                  num_hashes: int) -> "BloomFilter":
        bf = cls(num_bits, num_hashes)
        bf.bits = np.asarray(bits, dtype=np.uint8).copy()
        return bf

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.m
