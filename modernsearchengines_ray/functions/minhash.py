"""MinHash + LSH banding and n-gram Jaccard — near-dup kernels.

Beyond the reference's exact-simhash dedup, a 100 TB training-data
pipeline needs scalable near-duplicate detection; these are the standard
published constructions (Broder 1997 minhash; LSH banding per Mining of
Massive Datasets ch.3), implemented from scratch.

All randomness is a fixed seeded permutation family, so results are
deterministic across runs and nodes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+")

_MERSENNE_PRIME = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def word_shingles(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingles; EMPTY below n words (like word_ngrams).

    Docs too short to shingle are excluded from minhash banding and
    Jaccard mining entirely (they emit no band rows), matching the
    SQL oracle's ``len(words) >= n`` scope — the previous partial
    shingle fallback made every pair of short docs jaccard-1.0
    near-dups of each other (ADVICE r2)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    return jaccard(word_shingles(text_a, n), word_shingles(text_b, n))


class MinHasher:
    """num_perm Carter-Wegman hash permutations ((a*x+b) mod p, masked
    to 32 bits) over 32-bit shingle hashes, evaluated without 64-bit
    wrap (see __init__)."""

    def __init__(self, num_perm: int = 128, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        # a, b < 2^32 so a*x + b (x a 32-bit shingle hash) stays below
        # 2^64 and the mod-p reduction is EXACT — drawing a from [1, p)
        # like datasketch wraps a*x mod 2^64 first, a known bias of
        # that implementation we deliberately avoid (ADVICE r1).
        self.a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )
        # (a*x + b) mod p, min over shingles, per permutation
        phv = (self.a[:, None] * hashes[None, :] + self.b[:, None]) % _MERSENNE_PRIME
        return (phv & _MAX_HASH).min(axis=1)

    def band_keys(self, signature: np.ndarray, num_bands: int = 16) -> list[str]:
        """LSH band buckets: docs sharing any band key are candidates."""
        rows = self.num_perm // num_bands
        keys = []
        for band in range(num_bands):
            chunk = signature[band * rows : (band + 1) * rows]
            digest = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            keys.append(f"{band}:{digest}")
        return keys


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
