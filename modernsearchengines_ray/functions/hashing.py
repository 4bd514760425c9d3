"""Stable 64-bit hashing (version-independent, process-independent).

Used for term -> shard assignment, text fingerprints and deterministic
doc-id fallbacks.  Python's builtin ``hash`` is salted per process and
must never be used for data placement; these are FNV-1a / blake2b based
and stable across runs, nodes and Python versions.
"""

from __future__ import annotations

import hashlib

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for byte in data:
        h ^= byte
        h = (h * _FNV_PRIME) & _MASK64
    return h


def stable_hash64(value: str) -> int:
    """blake2b-8byte hash of the utf-8 string — the default stable hash."""
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "little"
    )


def term_shard(term: str, num_shards: int) -> int:
    return stable_hash64(term) % num_shards


def shard_array(terms, num_shards: int) -> np.ndarray:
    """Vectorized-ish shard assignment: hash each *unique* term once.

    Zipf distributions make uniques tiny relative to rows, so the Python
    loop is over the vocabulary of the batch, not the batch.
    """
    terms = np.asarray(terms, dtype=object)
    uniq, inverse = np.unique(terms, return_inverse=True)
    shards = np.fromiter(
        (term_shard(t, num_shards) for t in uniq), dtype=np.int32, count=len(uniq)
    )
    return shards[inverse]


def text_fingerprint(text: str) -> str:
    """Hex md5 of the raw text — exact-dup key (matches DuckDB md5())."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()
