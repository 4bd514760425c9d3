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

import hashlib
import re
from collections import Counter

_ALNUM_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)


def _features(text: str, width: int = 4) -> Counter:
    text = "".join(_ALNUM_RE.findall(text.lower()))
    if len(text) <= width:
        return Counter([text] if text else [])
    return Counter(text[i : i + width] for i in range(len(text) - width + 1))


def simhash64(text: str) -> int:
    counts = _features(text)
    if not counts:
        return 0
    v = [0] * 64
    for feature, weight in counts.items():
        h = int.from_bytes(
            hashlib.md5(feature.encode("utf-8")).digest()[:8], "little"
        )
        for bit in range(64):
            if (h >> bit) & 1:
                v[bit] += weight
            else:
                v[bit] -= weight
    result = 0
    for bit in range(64):
        if v[bit] > 0:
            result |= 1 << bit
    return result


def hamming_distance(x: int, y: int) -> int:
    return bin(x ^ y).count("1")
