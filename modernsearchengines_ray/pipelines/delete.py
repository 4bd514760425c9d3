"""Document deletion: tombstone ledger + exact physical purge.

The reference has no delete path (its upsert happens crawler-side,
before indexing — WebCrawler_basis.py:246-252); a web-scale index
needs one.  Two phases, Lucene's live-docs model:

1. :func:`delete_docs` appends doc_ids to the tombstone ledger
   (state/tombstones.py).  Serving filters them immediately
   (``QueryEngine.refresh_deletes`` for already-running engines):
   deleted docs never surface, surviving docs keep their exact scores
   — global stats (N, avgdl, df/idf) stay stale until purge, exactly
   as Lucene serves around deleted docs until a segment merge.

2. :func:`purge_deletes` makes deletion physical AND exact.  Because
   the index keeps its spill runs (``build_index(keep_runs=True)``,
   the same requirement incremental updates have), a purge is:

   - one Ray task per run file: read the file's shard segments + its
     trailing docstats ledger, drop every posting of a tombstoned
     doc (byte-sliced out of the varint position blobs — per-doc
     streams are independently delta-encoded, so no re-encode), and
     rewrite the file under a new generation name;
   - per spill manifest: swap in the new read plan and subtract the
     deleted docs' EXACT integer stat contributions (chars / indexed
     / count from the docstats ledger);
   - re-merge every shard over the purged runs with the recomputed
     global stats.

   The result is LOGICALLY IDENTICAL — same terms, df, idf,
   bit-equal per-posting BM25 floats, same positions — to a
   from-scratch build over the remaining corpus (gated in
   tests/test_delete_index.py), because the merge recomputes df/idf
   from the surviving postings and avg_doc_len divides the same
   integers a fresh build would.

   Crash safety: rewritten run files get generation-tagged names and
   each manifest swaps atomically, so any crash leaves every spill
   dir either fully old or fully new; shard re-merge resumes off the
   per-shard manifests as usual (the purge tag is deterministic from
   the tombstone set, so a re-run reuses completed shards).  The
   ledger clears only after meta commits.

A changed-page upsert is therefore ``delete_docs(old ids)`` +
``update_index(new versions)`` + (eventually) ``purge_deletes``.

The docstore (state/docstore.py) is corpus-side and append-only;
tombstoned docs never rank, so their stale metadata rows are
unreachable through serving and get dropped at the next docstore
rewrite.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig
from ..functions.arrowlist import list_values
from ..stages.spill import (
    SPILL_MANIFEST,
    read_segment,
    spill_manifest,
    write_run_file,
)
from ..stages.tokenize import RUN_SCHEMA
from ..state.manifest import completed_shards
from ..state.tombstones import (
    clear_tombstones,
    is_deleted,
    read_tombstones,
    write_tombstones,
)
from .build_index import (
    _delta_dirs,
    _fingerprint,
    _merge_shards,
    combined_corpus_id,
    read_meta,
    union_plan,
    write_meta,
)


def delete_docs(index_dir: str, doc_ids, batch_id: str) -> int:
    """Tombstone documents (serving filters them from the next engine
    construction / ``refresh_deletes`` on).  Idempotent by batch_id.
    Physical removal + exact stats: :func:`purge_deletes`."""
    return write_tombstones(index_dir, doc_ids, batch_id)


def _take_ranges(arr: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray) -> np.ndarray:
    """Concatenate ``arr[starts[i] : starts[i]+lens[i]]`` — vectorized."""
    total = int(lens.sum())
    if not total:
        return arr[:0]
    group_of = np.repeat(np.arange(len(lens)), lens)
    base = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=base[1:])
    inner = np.arange(total, dtype=np.int64)
    return arr[np.repeat(starts, lens) + inner - base[group_of]]


def _filter_positions_blob(blob: bytes, tfs: np.ndarray,
                           keep: np.ndarray) -> bytes:
    """Drop the dropped docs' position streams by byte-slicing.

    The blob is a concatenation of per-doc delta+varint streams
    (stages/tokenize._encode_positions — ``prev`` resets per doc), so
    kept docs' bytes are valid unchanged.  Varint value boundaries are
    the bytes with the high bit clear; doc i owns ``tfs[i]`` values.
    """
    buf = np.frombuffer(blob, dtype=np.uint8)
    value_ends = np.flatnonzero((buf & 0x80) == 0) + 1
    doc_ends = value_ends[np.cumsum(tfs) - 1]  # tf >= 1 always
    doc_starts = np.zeros(len(doc_ends), dtype=np.int64)
    doc_starts[1:] = doc_ends[:-1]
    return _take_ranges(
        buf, doc_starts[keep], (doc_ends - doc_starts)[keep]
    ).tobytes()


def filter_run_table(table: pa.Table, deleted: np.ndarray) -> pa.Table:
    """Drop every posting of the (sorted) ``deleted`` ids from a run
    table; rows whose posting list empties are dropped entirely."""
    if not table.num_rows:
        return table
    table = table.combine_chunks()
    row_lens = pc.list_value_length(table["doc_ids"]).to_numpy() \
        .astype(np.int64)
    flat_ids = list_values(table["doc_ids"]).to_numpy()
    keep_flat = ~is_deleted(flat_ids, deleted)
    if keep_flat.all():
        return table

    row_starts = np.zeros(len(row_lens), dtype=np.int64)
    np.cumsum(row_lens[:-1], out=row_starts[1:])
    new_lens = np.add.reduceat(keep_flat, row_starts)
    flat_tfs = list_values(table["tfs"]).to_numpy()
    flat_dls = list_values(table["doc_lens"]).to_numpy()

    keep_rows = new_lens > 0
    pos_col = table["positions"]
    new_blobs: list[bytes] = []
    for i in np.flatnonzero(keep_rows):
        lo, n = row_starts[i], row_lens[i]
        k = keep_flat[lo:lo + n]
        blob = pos_col[i].as_py()
        if k.all():
            new_blobs.append(blob)
        else:
            new_blobs.append(
                _filter_positions_blob(blob, flat_tfs[lo:lo + n], k))

    kept_offsets = np.zeros(int(keep_rows.sum()) + 1, dtype=np.int32)
    np.cumsum(new_lens[keep_rows], out=kept_offsets[1:])
    # flat values filtered to kept docs, then rows with 0 docs dropped
    # (their contribution to the flat arrays is empty by definition)
    return pa.table(
        {
            "term": table["term"].filter(pa.array(keep_rows)),
            "shard": table["shard"].filter(pa.array(keep_rows)),
            "doc_ids": pa.ListArray.from_arrays(
                pa.array(kept_offsets, pa.int32()),
                pa.array(flat_ids[keep_flat], pa.int64())),
            "tfs": pa.ListArray.from_arrays(
                pa.array(kept_offsets, pa.int32()),
                pa.array(flat_tfs[keep_flat], pa.int32())),
            "doc_lens": pa.ListArray.from_arrays(
                pa.array(kept_offsets, pa.int32()),
                pa.array(flat_dls[keep_flat], pa.int32())),
            "positions": pa.array(new_blobs, pa.binary()),
        },
        schema=RUN_SCHEMA,
    )


def _purge_file_task(batch: pa.Table, runs_dir: str, tomb_ref,
                     tag: str) -> pa.Table:
    """Purge one run file per input row; emits the new manifest entry
    pieces + exact stat deltas (zero-delta rows keep the old file)."""
    import ray

    deleted = ray.get(tomb_ref) if hasattr(tomb_ref, "hex") else tomb_ref
    out = {k: [] for k in ("sub", "file", "new_file", "shards",
                           "seg_offsets", "seg_lengths", "doc_segment",
                           "doc_range", "bytes", "n_del", "chars_del",
                           "indexed_del")}
    for i in range(batch.num_rows):
        sub = batch["sub"][i].as_py()
        name = batch["file"][i].as_py()
        sub_dir = os.path.join(runs_dir, sub) if sub else runs_dir
        docstats = read_segment(sub_dir, name,
                                batch["doc_segment"][i].as_py())
        dead = is_deleted(docstats["doc_id"].to_numpy(), deleted)
        out["sub"].append(sub)
        out["file"].append(name)
        if not dead.any():
            out["new_file"].append("")  # untouched
            out["shards"].append([])
            out["seg_offsets"].append([])
            out["seg_lengths"].append([])
            out["doc_segment"].append([])
            out["doc_range"].append([])
            out["bytes"].append(0)
            out["n_del"].append(0)
            out["chars_del"].append(0)
            out["indexed_del"].append(0)
            continue

        segs = []
        for s, off, ln in zip(batch["shards"][i].as_py(),
                              batch["seg_offsets"][i].as_py(),
                              batch["seg_lengths"][i].as_py()):
            filtered = filter_run_table(
                read_segment(sub_dir, name, [off, ln]), deleted)
            if filtered.num_rows:
                segs.append(filtered)
        run_table = pa.concat_tables(segs) if segs else pa.table(
            {n: pa.array([], RUN_SCHEMA.field(n).type)
             for n in RUN_SCHEMA.names}, schema=RUN_SCHEMA)
        live_stats = docstats.filter(pa.array(~dead))

        base = re.sub(r"\.g[0-9a-f]+(?=\.arrow$)", "", name)
        new_name = f"{base[:-6]}.g{tag}.arrow"
        entry = write_run_file(run_table, live_stats,
                               os.path.join(sub_dir, new_name))
        out["new_file"].append(new_name)
        out["shards"].append(entry["shards"])
        out["seg_offsets"].append(entry["seg_offsets"])
        out["seg_lengths"].append(entry["seg_lengths"])
        out["doc_segment"].append(entry["doc_segment"])
        live_ids = live_stats["doc_id"]
        out["doc_range"].append(
            [int(pc.min(live_ids).as_py()), int(pc.max(live_ids).as_py())]
            if live_stats.num_rows else [])
        out["bytes"].append(entry["bytes"])
        out["n_del"].append(int(dead.sum()))
        out["chars_del"].append(
            int(pc.sum(docstats.filter(pa.array(dead))["chars"])
                .as_py() or 0))
        out["indexed_del"].append(
            int(pc.sum(pc.cast(docstats.filter(pa.array(dead))["indexed"],
                               pa.int64())).as_py() or 0))
    return pa.table({
        "sub": pa.array(out["sub"], pa.string()),
        "file": pa.array(out["file"], pa.string()),
        "new_file": pa.array(out["new_file"], pa.string()),
        "shards": pa.array(out["shards"], pa.list_(pa.int32())),
        "seg_offsets": pa.array(out["seg_offsets"], pa.list_(pa.int64())),
        "seg_lengths": pa.array(out["seg_lengths"], pa.list_(pa.int64())),
        "doc_segment": pa.array(out["doc_segment"], pa.list_(pa.int64())),
        "doc_range": pa.array(out["doc_range"], pa.list_(pa.int64())),
        "bytes": pa.array(out["bytes"], pa.int64()),
        "n_del": pa.array(out["n_del"], pa.int64()),
        "chars_del": pa.array(out["chars_del"], pa.int64()),
        "indexed_del": pa.array(out["indexed_del"], pa.int64()),
    })


def _rewrite_spill_manifest(sub_dir: str, rows: list[dict],
                            tag: str) -> None:
    """Swap one spill manifest to the purged read plan and subtract
    the exact stat deltas; atomic, then the replaced files delete."""
    m = spill_manifest(sub_dir)
    replaced: list[str] = []
    for r in rows:
        if not r["new_file"]:
            continue
        del m["file_segments"][r["file"]]
        del m["doc_segments"][r["file"]]
        m.get("doc_ranges", {}).pop(r["file"], None)
        m["file_segments"][r["new_file"]] = {
            int(s): [int(o), int(ln)]
            for s, o, ln in zip(r["shards"], r["seg_offsets"],
                                r["seg_lengths"])
        }
        m["doc_segments"][r["new_file"]] = [int(x)
                                            for x in r["doc_segment"]]
        if len(r["doc_range"]):
            m.setdefault("doc_ranges", {})[r["new_file"]] = [
                int(x) for x in r["doc_range"]]
        replaced.append(r["file"])

    n_del = sum(r["n_del"] for r in rows)
    chars_del = sum(r["chars_del"] for r in rows)
    indexed_del = sum(r["indexed_del"] for r in rows)
    st = m["stats"]
    st["num_documents"] -= n_del
    st["num_indexed"] -= indexed_del
    m["char_sum"] = m["char_sum"] - chars_del
    st["avg_doc_len"] = (m["char_sum"] / st["num_documents"]
                         if st["num_documents"] else 0.0)
    if n_del:
        m["spill_key"] = f"{m['spill_key']}|purged:{tag}"

    path = os.path.join(sub_dir, SPILL_MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, path)
    for name in replaced:
        try:
            os.remove(os.path.join(sub_dir, name))
        except FileNotFoundError:
            pass  # a prior crashed attempt already removed it


def purge_deletes(
    index_dir: str,
    cfg: IndexConfig | None = None,
    merge_salts: int = 1,
) -> dict:
    """Physically remove every tombstoned document (see module
    docstring).  Returns ``{"purged": n, "shards_built": n, ...}``.
    No-op when the ledger is empty.

    ``cfg=None`` (default) reconstructs the merge-relevant config
    from the index's own meta.json — a purge never re-tokenizes, so
    the spill-side fields (chunk/cap/lemma) aren't needed and the
    caller can't accidentally diverge from the build's BM25 params.
    """
    import ray.data as rd

    deleted = read_tombstones(index_dir)
    if not len(deleted):
        return {"purged": 0, "shards_built": 0, "files_rewritten": 0}
    meta = read_meta(index_dir)
    if cfg is None:
        cfg = IndexConfig(
            k1=meta["k1"],
            b=meta["b"],
            min_df_exclusive=meta["min_df_exclusive"],
            num_shards=meta["num_shards"],
            block_size=meta["block_size"],
            prepend_url_words=meta["prepend_url_words"],
            shard_row_group_size=meta.get("shard_row_group_size"),
        )
    if meta["num_shards"] != cfg.num_shards:
        raise ValueError(
            f"cfg.num_shards={cfg.num_shards} != indexed "
            f"{meta['num_shards']}: shard routing would change")
    runs_dir = os.path.join(index_dir, "_runs")
    if not os.path.exists(os.path.join(runs_dir, SPILL_MANIFEST)):
        raise ValueError(
            "spill runs not found — build_index(..., keep_runs=True) "
            "is required for purges (same requirement as updates)")

    # deterministic purge identity: same ledger -> same tag, so a
    # crashed purge re-run resumes completed shards
    tag = hashlib.md5(deleted.tobytes()).hexdigest()[:10]

    items = []
    for sub in [""] + _delta_dirs(runs_dir):
        sub_dir = os.path.join(runs_dir, sub) if sub else runs_dir
        m = spill_manifest(sub_dir)
        if "doc_segments" not in m:
            raise ValueError(
                f"{sub_dir} predates delete support (no docstats "
                "ledger in the spill) — rebuild the index to purge")
        ranges = m.get("doc_ranges", {})
        for name, seg in m["doc_segments"].items():
            r = ranges.get(name)
            if r and int(np.searchsorted(deleted, r[1], side="right")
                         - np.searchsorted(deleted, r[0], side="left")) \
                    == 0:
                continue  # no tombstoned id falls in this file's range
            shard_segs = m["file_segments"].get(name, {})
            items.append({
                "sub": sub,
                "file": name,
                "shards": [int(s) for s in shard_segs],
                "seg_offsets": [v[0] for v in shard_segs.values()],
                "seg_lengths": [v[1] for v in shard_segs.values()],
                "doc_segment": [int(seg[0]), int(seg[1])],
            })

    import ray

    summary = []
    if items:
        tomb_ref = ray.put(deleted)  # broadcast once, not per task
        summary = rd.from_items(
            items, override_num_blocks=len(items),
        ).map_batches(
            _purge_file_task,
            batch_format="pyarrow",
            fn_kwargs={"runs_dir": runs_dir, "tomb_ref": tomb_ref,
                       "tag": tag},
        ).to_pandas().to_dict("records")
        assert len(summary) == len(items)

    by_sub: dict[str, list[dict]] = {}
    for r in summary:
        by_sub.setdefault(r["sub"], []).append(r)
    rewritten = 0
    for sub, rows in by_sub.items():
        if any(r["new_file"] for r in rows) or any(
                r["n_del"] for r in rows):
            sub_dir = os.path.join(runs_dir, sub) if sub else runs_dir
            _rewrite_spill_manifest(sub_dir, rows, tag)
            rewritten += sum(1 for r in rows if r["new_file"])

    stats, char_sum, files = union_plan(runs_dir)
    purged = int(sum(r["n_del"] for r in summary))

    if purged == 0 and stats.num_documents == meta["num_documents"] \
            and stats.num_indexed == meta["num_indexed"] \
            and char_sum == meta.get("char_sum"):
        # nothing tombstoned exists in the index and no crashed purge
        # left the manifests ahead of meta: the index is already the
        # purged index — just retire the ledger
        clear_tombstones(index_dir)
        return {"purged": 0, "shards_built": 0, "files_rewritten": 0}

    # reached only when this run purged docs OR a crashed prior run
    # with the SAME ledger (same tag) left the manifests ahead of
    # meta — either way the tag belongs in the history, and keeping
    # it identical across the re-run lets completed shards resume
    history = list(meta.get("purge_history") or [])
    if tag not in history:
        history.append(tag)
    meta_for_id = {**meta, "purge_history": history}
    combined_id = combined_corpus_id(meta_for_id, runs_dir)
    fingerprint = _fingerprint(stats, cfg, combined_id)
    done = completed_shards(index_dir, fingerprint)
    todo = [k for k in range(cfg.num_shards) if k not in done]
    _merge_shards(todo, runs_dir, files, index_dir, stats, cfg,
                  fingerprint, merge_salts)

    write_meta(index_dir, stats, cfg, fingerprint,
               corpus_id=meta.get("corpus_id", ""), char_sum=char_sum,
               extra={"purge_history": history})
    clear_tombstones(index_dir)
    return {
        "purged": purged,
        "shards_built": len(todo),
        "files_rewritten": rewritten,
        "files_scanned": len(items),  # post-range-prune task count
        "fingerprint": fingerprint,
    }
