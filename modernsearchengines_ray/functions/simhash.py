"""64-bit SimHash (Charikar 2002) — near-duplicate fingerprint.

The reference computes ``Simhash(text).value`` per page and flags pairs
whose similarity ``1 - hamming/64`` exceeds 0.99, which for 64-bit
hashes means **exact equality only** (SURVEY.md §2.7 D2, verified
arithmetically from /root/reference/WebCrawler_basis.py:275-293).  The
pypi ``simhash`` package is not available here, so this is a from-
scratch implementation of the standard algorithm with the same feature
model the package uses by default: lowercase alphanumeric text, 4-char
sliding-window shingles, weight = shingle count.  Dedup groups are
defined by exact hash equality, so the dedup *semantics* are preserved
regardless of the per-feature hash function.
"""

from __future__ import annotations

import re

import numpy as np

_ALNUM_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)
_BIT_RANGE = np.arange(64, dtype=np.uint64)
_SHINGLE_WIDTH = 4
#: multipliers of the degree-3 polynomial feature hash (odd constants,
#: splitmix-style): h(c0..c3) = Σ ci * Mi  (mod 2^64) then finalized
_POLY = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche so neighboring shingles decorrelate."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def simhash64(text: str) -> int:
    """64-bit simhash, fully vectorized.

    Features are 4-char shingles of the lowercased alphanumeric text;
    feature hashes come from a vectorized polynomial-plus-avalanche of
    the codepoint array (no per-shingle Python or md5 — this kernel
    runs once per corpus document).  Dedup semantics (exact-equality
    groups, SURVEY.md §2.7 D2) are independent of the feature hash.
    """
    normalized = "".join(_ALNUM_RE.findall(text.lower()))
    if not normalized:
        return 0
    codes = np.frombuffer(
        normalized.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    if len(codes) <= _SHINGLE_WIDTH:
        window = np.zeros(_SHINGLE_WIDTH, dtype=np.uint64)
        window[: len(codes)] = codes
        hashes = _finalize((window * _POLY).sum(dtype=np.uint64)[None])
    else:
        n = len(codes) - _SHINGLE_WIDTH + 1
        acc = np.zeros(n, dtype=np.uint64)
        for k in range(_SHINGLE_WIDTH):
            acc += codes[k : k + n] * _POLY[k]
        hashes = _finalize(acc)
    # per-bit vote Σ(2b-1): voting every occurrence equals weighting
    # uniques by count, so no np.unique; unpackbits column-sums keep
    # the working set at 1 byte/bit instead of an n x 64 int64 matrix
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    ones = bits.sum(axis=0, dtype=np.int64)
    result_bits = (2 * ones > len(hashes)).astype(np.uint64)
    return int((result_bits << _BIT_RANGE).sum())


def hamming_distance(x: int, y: int) -> int:
    return bin(x ^ y).count("1")
