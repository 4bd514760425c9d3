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

    # -- vectorized int-key path (bloom joins over numeric keys) -----
    # A filter must be BUILT and PROBED through the same path: the int
    # kernels hash with splitmix64 mixing, not md5, so int-added keys
    # are only findable via contains_ints (and vice versa for str).

    @staticmethod
    def _mix_ints(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        with np.errstate(over="ignore"):
            z = vals.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h1 = z ^ (z >> np.uint64(31))
            w = h1 + np.uint64(0x9E3779B97F4A7C15)
            w = (w ^ (w >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            w = (w ^ (w >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h2 = (w ^ (w >> np.uint64(31))) | np.uint64(1)
        return h1, h2

    def _probe_matrix(self, vals: np.ndarray) -> np.ndarray:
        h1, h2 = self._mix_ints(vals)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) \
                % np.uint64(self.m)

    def add_ints(self, vals: np.ndarray) -> None:
        idx = self._probe_matrix(np.asarray(vals)).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))

    def contains_ints(self, vals: np.ndarray) -> np.ndarray:
        idx = self._probe_matrix(np.asarray(vals))
        bit = (self.bits[(idx >> np.uint64(3)).astype(np.int64)]
               >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

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
