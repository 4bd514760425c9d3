"""Delta + varint (LEB128) codec for posting lists.

The on-disk index stores each term's doc-id list delta-encoded and
varint-compressed, tf values varint-compressed, and per-doc position
lists delta+varint-compressed with a length prefix — the compressed
posting-list layout the north star asks for.  Scores stay raw float64
(rank-identity to the oracle requires lossless scores).

Encoding is a Python loop over the posting list of one term (runs inside
the per-shard groupby task); decoding is numpy-assisted and runs inside
the shard-scorer actors.
"""

from __future__ import annotations

import numpy as np


def encode_varint_deltas(values: np.ndarray | list[int], delta: bool = True) -> bytes:
    """Encode a non-decreasing (if delta) int sequence as LEB128 varints."""
    out = bytearray()
    prev = 0
    for v in values:
        v = int(v)
        if delta:
            d = v - prev
            prev = v
        else:
            d = v
        if d < 0:
            raise ValueError("varint delta must be non-negative")
        while True:
            byte = d & 0x7F
            d >>= 7
            if d:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
    return bytes(out)


def decode_varint_deltas(buf: bytes, count: int, delta: bool = True) -> np.ndarray:
    """Decode ``count`` varints; cumulative-sum when ``delta``."""
    out = np.empty(count, dtype=np.int64)
    pos = 0
    for i in range(count):
        shift = 0
        value = 0
        while True:
            byte = buf[pos]
            pos += 1
            value |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        out[i] = value
    if delta:
        np.cumsum(out, out=out)
    return out


def encode_position_lists(position_lists: list[list[int]]) -> bytes:
    """Concatenate per-doc position lists: varint(len) + delta-varint body."""
    out = bytearray()
    for positions in position_lists:
        out += encode_varint_deltas([len(positions)], delta=False)
        out += encode_varint_deltas(positions, delta=True)
    return bytes(out)


def decode_position_lists(buf: bytes, num_docs: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_position_lists`."""
    lists: list[np.ndarray] = []
    pos = 0

    def _read_varint() -> int:
        nonlocal pos
        shift = 0
        value = 0
        while True:
            byte = buf[pos]
            pos += 1
            value |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return value
            shift += 7

    for _ in range(num_docs):
        n = _read_varint()
        arr = np.empty(n, dtype=np.int64)
        prev = 0
        for i in range(n):
            prev += _read_varint()
            arr[i] = prev
        lists.append(arr)
    return lists
