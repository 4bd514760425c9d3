"""Index integrity verification — the Lucene-CheckIndex analogue.

An operational index (incremental updates, deletes/purges, compaction,
crash-resume at every stage) needs a cheap way to prove the on-disk
bytes are still a valid index before trusting a serving fleet to them.
``check_index`` decodes EVERY posting row of every shard, one
independent Ray task per shard, and verifies the structural
invariants the codecs and the serving path rely on:

  per term row
  - df == decoded posting count == len(counts) == len(bm25 floats)
  - sum(seg_lens) == df and every segment length > 0
  - doc_ids strictly ascending WITHIN each segment (the WAND cursor
    precondition)
  - positions blob holds exactly sum(tfs) varints, each per-doc
    stream strictly ascending
  - df > min_df_exclusive (the persist-time prune held)
  - idf == log((N - df + 0.5) / (df + 0.5) + 1) bit-exactly
  - min/max_bm25 == min/max of the decoded scores
  - block metadata aligned: per segment ceil(seg_len / block_size)
    blocks, block_max == max score of its block, block_first ==
    first doc of its block
  per shard
  - every term hashes to this shard (routing invariant)
  - manifest row/posting counts match the parquet

plus the shard set itself (one manifest per configured shard).  The
whole check is a map over shard ids — no shuffle, scales with shard
count, reads each shard once.

Returns ``{"ok": bool, "shards": n, "terms": n, "postings": n,
"errors": [...]}`` (errors capped per shard, first-error style).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.varint import decode_grouped_deltas_np, decode_varints_np
from ..state.manifest import read_manifests, shard_path
from .build_index import read_meta

_MAX_ERRORS_PER_SHARD = 10


def check_shard_table(table: pa.Table, shard_id: int, num_shards: int,
                      num_documents: int, min_df: int,
                      block_size: int) -> tuple[int, list[str]]:
    """Verify one shard table; returns (postings_checked, errors)."""
    from ..functions.hashing import term_shard

    errors: list[str] = []
    postings = 0

    def err(msg: str) -> bool:
        errors.append(f"shard {shard_id}: {msg}")
        return len(errors) >= _MAX_ERRORS_PER_SHARD

    for i in range(table.num_rows):
        term = table["term"][i].as_py()
        df = int(table["df"][i].as_py())
        seg_lens = np.asarray(table["seg_lens"][i].as_py(),
                              dtype=np.int64)
        if term_shard(term, num_shards) != shard_id:
            if err(f"term {term!r} routed to wrong shard"):
                break
        if df <= min_df:
            if err(f"term {term!r}: df {df} <= prune bound {min_df}"):
                break
        if len(seg_lens) == 0 or (seg_lens <= 0).any() \
                or int(seg_lens.sum()) != df:
            if err(f"term {term!r}: seg_lens {seg_lens.tolist()} "
                   f"inconsistent with df {df}"):
                break
            continue
        doc_ids = decode_grouped_deltas_np(
            table["doc_ids"][i].as_py(), seg_lens)
        counts = decode_varints_np(
            table["counts"][i].as_py()).astype(np.int64)
        scores = np.frombuffer(table["bm25"][i].as_py(), dtype="<f8")
        if len(doc_ids) != df or len(counts) != df or len(scores) != df:
            if err(f"term {term!r}: decoded lengths "
                   f"({len(doc_ids)}/{len(counts)}/{len(scores)}) != df"):
                break
            continue
        seg_starts = np.zeros(len(seg_lens), dtype=np.int64)
        np.cumsum(seg_lens[:-1], out=seg_starts[1:])
        deltas = np.diff(doc_ids)
        # within-segment ascending: only deltas at segment joins may
        # be <= 0
        join_idx = seg_starts[1:] - 1
        bad = np.flatnonzero(deltas <= 0)
        if len(np.setdiff1d(bad, join_idx, assume_unique=False)):
            if err(f"term {term!r}: doc_ids not ascending in-segment"):
                break
        if (counts <= 0).any():
            if err(f"term {term!r}: non-positive tf"):
                break
        flat_pos = decode_grouped_deltas_np(
            table["positions"][i].as_py(), counts)
        if len(flat_pos) != int(counts.sum()):
            if err(f"term {term!r}: positions count "
                   f"{len(flat_pos)} != sum(tf) {int(counts.sum())}"):
                break
        else:
            pos_starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=pos_starts[1:])
            pdeltas = np.diff(flat_pos)
            pjoin = pos_starts[1:] - 1
            pbad = np.flatnonzero(pdeltas <= 0)
            if len(np.setdiff1d(pbad, pjoin)):
                if err(f"term {term!r}: positions not ascending per doc"):
                    break
        want_idf = float(np.log(
            (num_documents - df + 0.5) / (df + 0.5) + 1.0))
        if float(table["idf"][i].as_py()) != want_idf:
            if err(f"term {term!r}: idf mismatch"):
                break
        if float(table["min_bm25"][i].as_py()) != float(scores.min()) \
                or float(table["max_bm25"][i].as_py()) != float(scores.max()):
            if err(f"term {term!r}: min/max_bm25 mismatch"):
                break
        block_first = np.asarray(table["block_first_doc"][i].as_py(),
                                 dtype=np.int64)
        block_max = np.asarray(table["block_max_bm25"][i].as_py())
        nb_want = int(((seg_lens + block_size - 1) // block_size).sum())
        if len(block_first) != nb_want or len(block_max) != nb_want:
            if err(f"term {term!r}: block count {len(block_first)} "
                   f"!= expected {nb_want}"):
                break
        else:
            bi = 0
            for s0, sl in zip(seg_starts, seg_lens):
                for lo in range(0, int(sl), block_size):
                    hi = min(int(sl), lo + block_size)
                    if block_first[bi] != doc_ids[s0 + lo] or \
                            block_max[bi] != scores[s0 + lo:s0 + hi].max():
                        err(f"term {term!r}: block {bi} metadata wrong")
                        bi = -1
                        break
                    bi += 1
                if bi < 0:
                    break
            if len(errors) >= _MAX_ERRORS_PER_SHARD:
                break
        postings += df
    return postings, errors


def _check_task(batch: pa.Table, index_dir: str, num_shards: int,
                num_documents: int, min_df: int,
                block_size: int) -> pa.Table:
    import pyarrow.parquet as pq

    manifests = read_manifests(index_dir)
    out = {"shard": [], "terms": [], "postings": [], "errors": []}
    for shard_id in batch["shard"].to_pylist():
        table = pq.read_table(shard_path(index_dir, shard_id))
        postings, errors = check_shard_table(
            table, shard_id, num_shards, num_documents, min_df,
            block_size)
        m = manifests.get(shard_id)
        if m is None:
            errors.append(f"shard {shard_id}: manifest missing")
        else:
            if m.row_count != table.num_rows:
                errors.append(
                    f"shard {shard_id}: manifest rows {m.row_count} "
                    f"!= parquet rows {table.num_rows}")
            n_post = int(pa.compute.sum(table["df"]).as_py() or 0)
            if m.postings_count != n_post:
                errors.append(
                    f"shard {shard_id}: manifest postings "
                    f"{m.postings_count} != decoded {n_post}")
        out["shard"].append(shard_id)
        out["terms"].append(table.num_rows)
        out["postings"].append(postings)
        out["errors"].append(errors)
    return pa.table({
        "shard": pa.array(out["shard"], pa.int32()),
        "terms": pa.array(out["terms"], pa.int64()),
        "postings": pa.array(out["postings"], pa.int64()),
        "errors": pa.array(out["errors"], pa.list_(pa.string())),
    })


def check_index(index_dir: str) -> dict:
    """Verify the whole index; see module docstring."""
    import ray.data as rd

    meta = read_meta(index_dir)
    manifests = read_manifests(index_dir)
    errors: list[str] = []
    for k in range(meta["num_shards"]):
        if k not in manifests:
            errors.append(f"shard {k}: no manifest (incomplete build?)")
    shard_ids = sorted(manifests.keys())
    terms = postings = 0
    if shard_ids:
        summary = rd.from_items(
            [{"shard": k} for k in shard_ids],
            override_num_blocks=len(shard_ids),
        ).map_batches(
            _check_task,
            batch_format="pyarrow",
            fn_kwargs={
                "index_dir": index_dir,
                "num_shards": meta["num_shards"],
                "num_documents": meta["num_documents"],
                "min_df": meta["min_df_exclusive"],
                "block_size": meta["block_size"],
            },
        ).to_pandas()
        terms = int(summary["terms"].sum())
        postings = int(summary["postings"].sum())
        for errs in summary["errors"]:
            errors.extend(errs)
    return {
        "ok": not errors,
        "shards": len(shard_ids),
        "terms": terms,
        "postings": postings,
        "errors": errors,
    }
