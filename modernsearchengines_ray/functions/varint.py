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


def encode_varints_np(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encoding of a non-negative int array (numpy).

    O(max_varint_len) vector passes instead of a per-value Python loop —
    this is the hot path of shard construction.
    """
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    lengths = np.ones(n, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        lengths += tmp > 0
        tmp >>= np.uint64(7)
    maxlen = int(lengths.max())
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    cur = vals.copy()
    for i in range(maxlen):
        buf[:, i] = (cur & np.uint64(0x7F)).astype(np.uint8)
        cur >>= np.uint64(7)
    col = np.arange(maxlen)[None, :]
    buf |= ((col < (lengths - 1)[:, None]) * np.uint8(0x80)).astype(np.uint8)
    return buf[col < lengths[:, None]].tobytes()


def decode_varints_np(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode of a whole buffer (all varints in it)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((arr & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    payload = (arr & 0x7F).astype(np.uint64)
    values = np.zeros(len(ends), dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        values[mask] |= payload[starts[mask] + i] << np.uint64(7 * i)
    return values


def varint_lengths_np(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized): 1 + one per 7 bits."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ones(len(vals), dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        lengths += tmp > 0
        tmp >>= np.uint64(7)
    return lengths


def encode_deltas_np(sorted_values: np.ndarray) -> bytes:
    """Delta + vectorized varint for a non-decreasing int64 array."""
    vals = np.ascontiguousarray(sorted_values, dtype=np.int64)
    if len(vals) == 0:
        return b""
    deltas = np.empty_like(vals)
    deltas[0] = vals[0]
    np.subtract(vals[1:], vals[:-1], out=deltas[1:])
    if (deltas < 0).any():
        raise ValueError("input not non-decreasing")
    return encode_varints_np(deltas)


def decode_deltas_np(buf: bytes) -> np.ndarray:
    deltas = decode_varints_np(buf).astype(np.int64)
    np.cumsum(deltas, out=deltas)
    return deltas


def encode_grouped_deltas_np(flat_values: np.ndarray, group_starts: np.ndarray) -> bytes:
    """Delta-encode values that restart at each group start (per-doc
    position lists flattened into one array), then varint the deltas."""
    vals = np.ascontiguousarray(flat_values, dtype=np.int64)
    if len(vals) == 0:
        return b""
    deltas = np.empty_like(vals)
    deltas[0] = vals[0]
    np.subtract(vals[1:], vals[:-1], out=deltas[1:])
    starts = np.asarray(group_starts, dtype=np.int64)
    deltas[starts] = vals[starts]
    if (deltas < 0).any():
        raise ValueError("positions not sorted within a group")
    return encode_varints_np(deltas)


def decode_grouped_deltas_np(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_grouped_deltas_np`; returns the flat array."""
    deltas = decode_varints_np(buf).astype(np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=starts[1:])
    nonzero_counts = counts[counts > 0]
    starts = starts[counts > 0]
    # segmented cumsum: global cumsum minus each group's preceding total
    out = np.cumsum(deltas)
    if len(starts) > 1:
        group_offsets = np.concatenate(([0], out[starts[1:] - 1]))
        out = out - np.repeat(group_offsets, nonzero_counts)
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
