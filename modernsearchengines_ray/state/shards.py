"""Shard reading helpers (diagnostics / conformance tests).

``load_index_postings`` decodes a whole on-disk index back into the
logical ``{term: {doc_id: (bm25, positions)}}`` shape — the same shape
as the oracle's in-memory index — so tests can compare the distributed
build against the sequential one posting-for-posting.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from ..functions.varint import (
    decode_grouped_deltas_np,
    decode_varints_np,
)


def list_shard_files(index_dir: str) -> list[str]:
    return sorted(
        os.path.join(index_dir, f)
        for f in os.listdir(index_dir)
        if f.startswith("shard=") and f.endswith(".parquet")
    )


def load_index_postings(index_dir: str) -> dict[str, dict[int, tuple]]:
    out: dict[str, dict[int, tuple]] = {}
    for path in list_shard_files(index_dir):
        table = pq.read_table(path)
        for i in range(table.num_rows):
            term = table["term"][i].as_py()
            seg_lens = np.asarray(table["seg_lens"][i].as_py(), dtype=np.int64)
            doc_ids = decode_grouped_deltas_np(
                table["doc_ids"][i].as_py(), seg_lens
            )
            counts = decode_varints_np(table["counts"][i].as_py()).astype(np.int64)
            scores = np.frombuffer(table["bm25"][i].as_py(), dtype="<f8")
            flat_pos = decode_grouped_deltas_np(table["positions"][i].as_py(), counts)
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            docs: dict[int, tuple] = {}
            for j in range(len(doc_ids)):
                positions = flat_pos[starts[j] : starts[j] + counts[j]]
                docs[int(doc_ids[j])] = (float(scores[j]), positions.tolist())
            out[term] = docs
    return out
