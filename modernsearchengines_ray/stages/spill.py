"""Storage shuffle for index build: shard-partitioned run spill + merge.

The index build's one wide exchange routes every posting run to its
``shard = hash(term) % S``.  Expressing it as
``runs.groupby("shard").map_groups(...)`` (the Dataset-native form)
pays an object-store all-to-all whose sort/exchange cost measured
nearly flat in CPUs (0.37 scaling efficiency 8->32 on this box).  At
10^12-doc scale that exchange is also the cluster's biggest
network/memory spike.

This module replaces it with the classic external ("storage") shuffle,
still driven entirely by Ray Data operators:

  Stage 1 — spill  (map-only, streaming, zero barriers):
    ``corpus.map_batches(spill_task)``: each task tokenizes its batch
    (stages/tokenize.build_runs — also yielding the corpus-stat
    partials, so stats need no second corpus pass), sorts the run rows
    by shard, and writes ONE Arrow-IPC file of per-shard segments; the
    byte range of every segment goes into the per-task summary row and
    from there into the spill manifest.  (Parquet run files were tried
    first: merge then pays a footer parse per (file, shard) — cost
    grows with file count, i.e. with parallelism, and the merge stage
    measurably ANTI-scaled.  IPC + manifest byte ranges make a merge
    read one seek per file, no metadata parsing; spill files are
    transient so parquet's self-description buys nothing.)

  Stage 2 — merge  (map-only over shard ids, embarrassingly parallel):
    ``from_items(todo_shards).map_batches(merge_task)``: each task
    reads exactly its shard's byte ranges from every run file, merges
    them with postings.build_shard_table, writes the shard atomically
    and its lineage manifest entry.

Why this scales where the all-to-all didn't: both stages are pure map
stages (linear in workers); the exchange rides on storage bandwidth
(local disk here, shared object storage on a real cluster) instead of
a synchronized in-memory sort; and either stage resumes independently
— the spill manifest checkpoints stage 1, the per-shard manifests
checkpoint stage 2 (state/manifest.py).

Run-file naming is deterministic per batch (min doc_id in the batch),
so a retried spill task overwrites its own file instead of duplicating
runs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..stages.tokenize import RUN_SCHEMA, build_runs
from .stats import CorpusStats

SPILL_MANIFEST = "_spill.json"

#: lz4 frames inside the IPC stream: spill bytes cost ~disk bandwidth,
#: decode is nearly free in the merge
_IPC_OPTIONS = pa.ipc.IpcWriteOptions(compression="lz4")


def _ipc_bytes(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema,
                           options=_IPC_OPTIONS) as writer:
        writer.write_table(table)
    return sink.getvalue().to_pybytes()


def write_run_file(table: pa.Table, docstats: pa.Table,
                   path: str) -> dict:
    """Write one run file: per-shard IPC run segments, then one
    trailing docstats segment (stages/tokenize.DOCSTATS_SCHEMA — the
    purge's exact-stat ledger).  ``table`` must already be sorted by
    (shard, term).  Atomic via pid-suffixed tmp + rename: a task
    retry racing its dead predecessor (or two attempts of the same
    batch) never clobbers a tmp mid-write; the final rename is
    last-wins, idempotent for identical inputs.

    Returns the manifest entry pieces: shards / seg_offsets /
    seg_lengths (parallel lists), doc_segment [offset, length], bytes.
    """
    shards = table["shard"].to_numpy() if table.num_rows \
        else np.empty(0, np.int32)
    bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(shards)) + 1, [len(shards)])
    ) if table.num_rows else np.array([0])
    file_shards = [int(s) for s in shards[bounds[:-1]]]
    seg_offsets: list[int] = []
    seg_lengths: list[int] = []
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        offset = 0
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            buf = _ipc_bytes(table.slice(lo, hi - lo))
            f.write(buf)
            seg_offsets.append(offset)
            seg_lengths.append(len(buf))
            offset += len(buf)
        doc_buf = _ipc_bytes(docstats)
        f.write(doc_buf)
        doc_segment = [offset, len(doc_buf)]
    os.replace(tmp, path)
    return {
        "shards": file_shards,
        "seg_offsets": seg_offsets,
        "seg_lengths": seg_lengths,
        "doc_segment": doc_segment,
        "bytes": os.path.getsize(path),
    }


def spill_task(batch: pa.Table, cfg: IndexConfig, runs_dir: str) -> pa.Table:
    """Tokenize one corpus batch and spill its runs partitioned by shard."""
    table, (count, char_sum, indexed), docstats = build_runs(batch, cfg)

    name = f"run-{min(batch['doc_id'].to_pylist(), default=0)}.arrow"
    path = os.path.join(runs_dir, name)
    nbytes = 0
    file_shards: list[int] = []
    seg_offsets: list[int] = []
    seg_lengths: list[int] = []
    doc_segment: list[int] = []
    if batch.num_rows:
        order = pa.compute.sort_indices(
            table, sort_keys=[("shard", "ascending"), ("term", "ascending")]
        )
        table = table.take(order).combine_chunks()
        entry = write_run_file(table, docstats, path)
        file_shards = entry["shards"]
        seg_offsets = entry["seg_offsets"]
        seg_lengths = entry["seg_lengths"]
        doc_segment = entry["doc_segment"]
        nbytes = entry["bytes"]

    ids = batch["doc_id"].to_pylist() if batch.num_rows else []
    return pa.table({
        "file": pa.array([name if batch.num_rows else ""], pa.string()),
        "count": pa.array([count], pa.int64()),
        "char_sum": pa.array([char_sum], pa.int64()),
        "indexed": pa.array([indexed], pa.int64()),
        "runs": pa.array([table.num_rows], pa.int64()),
        "bytes": pa.array([nbytes], pa.int64()),
        "shards": pa.array([file_shards], pa.list_(pa.int32())),
        "seg_offsets": pa.array([seg_offsets], pa.list_(pa.int64())),
        "seg_lengths": pa.array([seg_lengths], pa.list_(pa.int64())),
        "doc_segment": pa.array([doc_segment], pa.list_(pa.int64())),
        # [min, max] doc id in this file — the purge's range-prune key
        "doc_range": pa.array(
            [[min(ids), max(ids)] if ids else []], pa.list_(pa.int64())),
    })


def spill_runs(
    corpus_ds,
    runs_dir: str,
    cfg: IndexConfig,
    spill_key: str,
    batch_size: int | None = None,
) -> CorpusStats:
    """Stage 1. Returns corpus stats; writes ``runs_dir/_spill.json``.

    ``spill_key`` identifies the (corpus, tokenizer-config) pair; a
    matching existing manifest short-circuits the whole stage (resume).

    ``batch_size=None`` spills one run file per input block — run-file
    count (= per-merge seeks) is then controlled at the read site
    (``override_num_blocks``); aim for a few blocks per CPU.
    """
    manifest_path = os.path.join(runs_dir, SPILL_MANIFEST)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("spill_key") == spill_key:
            return CorpusStats(**m["stats"])

    os.makedirs(runs_dir, exist_ok=True)
    summary = corpus_ds.map_batches(
        spill_task,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"cfg": cfg, "runs_dir": runs_dir},
    ).to_pandas()

    n = int(summary["count"].sum())
    stats = CorpusStats(
        num_documents=n,
        avg_doc_len=(int(summary["char_sum"].sum()) / n) if n else 0.0,
        num_indexed=int(summary["indexed"].sum()),
    )
    # per file: {shard: [offset, length]} — the merge's read plan
    file_segments = {
        f: {int(s): [int(o), int(ln)]
            for s, o, ln in zip(shards, offs, lens)}
        for f, shards, offs, lens in zip(
            summary["file"], summary["shards"],
            summary["seg_offsets"], summary["seg_lengths"],
        ) if f
    }
    # per file: [offset, length] of the trailing docstats segment —
    # the purge's exact-stat ledger (pipelines/delete.py)
    doc_segments = {
        f: [int(seg[0]), int(seg[1])]
        for f, seg in zip(summary["file"], summary["doc_segment"])
        if f and len(seg)
    }
    # per file: [min_doc, max_doc] — lets a purge skip files whose id
    # range can't contain any tombstoned doc (takedowns are localized)
    doc_ranges = {
        f: [int(r[0]), int(r[1])]
        for f, r in zip(summary["file"], summary["doc_range"])
        if f and len(r)
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({
            "spill_key": spill_key,
            "stats": stats.__dict__,
            # exact integer char sum: incremental updates recompute the
            # union avg_doc_len as sum(char_sum)/sum(n) — bit-identical
            # to what a from-scratch build over the union would divide
            "char_sum": int(summary["char_sum"].sum()),
            "file_segments": file_segments,
            "doc_segments": doc_segments,
            "doc_ranges": doc_ranges,
            "runs": int(summary["runs"].sum()),
            "bytes": int(summary["bytes"].sum()),
        }, f)
    os.replace(tmp, manifest_path)
    return stats


def spill_manifest(runs_dir: str) -> dict:
    """The raw spill manifest (stats + char_sum + read plan)."""
    with open(os.path.join(runs_dir, SPILL_MANIFEST)) as f:
        return json.load(f)


def spilled_files(runs_dir: str) -> dict[str, dict]:
    """file -> {shard: [offset, length]} (the manifest read plan)."""
    segs = spill_manifest(runs_dir)["file_segments"]
    # JSON object keys are strings; shard ids are ints
    return {f: {int(k): v for k, v in m.items()} for f, m in segs.items()}


def read_segment(runs_dir: str, name: str, segment: list[int]) -> pa.Table:
    """One IPC segment of one run file — a seek + exact-range read."""
    offset, length = segment
    with open(os.path.join(runs_dir, name), "rb") as f:
        f.seek(offset)
        buf = f.read(length)
    with pa.ipc.open_stream(pa.py_buffer(buf)) as reader:
        return reader.read_all()


def read_shard_runs(
    runs_dir: str, file_segments: dict[str, dict], shard_id: int
) -> pa.Table:
    """All run rows of one shard — one seek + exact-range read per file."""
    tables = []
    for name in sorted(file_segments):
        seg = file_segments[name].get(shard_id)
        if seg is None:
            continue
        offset, length = seg
        with open(os.path.join(runs_dir, name), "rb") as f:
            f.seek(offset)
            buf = f.read(length)
        with pa.ipc.open_stream(pa.py_buffer(buf)) as reader:
            tables.append(reader.read_all())
    if not tables:
        return pa.table(
            {name: pa.array([], RUN_SCHEMA.field(name).type)
             for name in RUN_SCHEMA.names},
            schema=RUN_SCHEMA,
        )
    return pa.concat_tables(tables)
