"""Index build pipeline: corpus Dataset -> sharded on-disk inverted index.

Two map-only Ray Data stages joined by a storage shuffle (stages/spill.py):

  corpus(doc_id, text[, url])
    -> spill: tokenize + stat partials + shard-partitioned run files
       (one streaming map_batches pass, no object-store all-to-all)
    -> merge: from_items(todo shards).map_batches — each task reads its
       shard's row groups from the run files, builds the shard
       (postings.build_shard_table) and writes it + its manifest entry
    -> meta.json + manifest summary

Resume is two-level: a completed spill is reused via its manifest; a
completed shard (state/manifest.py fingerprint match) is never rebuilt.
The returned BuildResult carries per-shard metrics from the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow as pa

from ..config import DEFAULT_INDEX_CONFIG, IndexConfig
from ..stages.postings import build_shard_table, finalize_shard_table
from ..stages.spill import (
    SPILL_MANIFEST,
    read_shard_runs,
    spill_manifest,
    spill_runs,
    spilled_files,
)
from ..stages.stats import CorpusStats
from ..state.manifest import (
    ShardManifest,
    atomic_write_parquet,
    completed_shards,
    read_manifests,
    shard_path,
    write_shard_manifest,
)

META_FILE = "meta.json"


@dataclass
class BuildResult:
    index_dir: str
    stats: CorpusStats
    fingerprint: str
    shards_built: int
    shards_skipped: int
    terms: int
    postings: int
    bytes: int


def _fingerprint(stats: CorpusStats, cfg: IndexConfig, corpus_id: str) -> str:
    payload = json.dumps(
        {
            "corpus_id": corpus_id,
            "n": stats.num_documents,
            "avg": stats.avg_doc_len,
            "k1": cfg.k1,
            "b": cfg.b,
            "min_df": cfg.min_df_exclusive,
            "shards": cfg.num_shards,
            "chunk": cfg.chunk_chars,
            "cap": cfg.max_doc_chars,
            "url_words": cfg.prepend_url_words,
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def write_meta(index_dir: str, stats: CorpusStats, cfg: IndexConfig,
               fingerprint: str, corpus_id: str = "",
               char_sum: int | None = None,
               extra: dict | None = None) -> None:
    meta = {
        "num_documents": stats.num_documents,
        "avg_doc_len": stats.avg_doc_len,
        "num_indexed": stats.num_indexed,
        "num_shards": cfg.num_shards,
        "k1": cfg.k1,
        "b": cfg.b,
        "min_df_exclusive": cfg.min_df_exclusive,
        "block_size": cfg.block_size,
        "chunk_chars": cfg.chunk_chars,
        "prepend_url_words": cfg.prepend_url_words,
        "shard_row_group_size": cfg.shard_row_group_size,
        "fingerprint": fingerprint,
        "corpus_id": corpus_id,
        "char_sum": char_sum,
        **(extra or {}),
    }
    tmp = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, META_FILE))


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def _spill_key(cfg: IndexConfig, corpus_id: str) -> str:
    """Identity of (corpus, tokenizer-affecting config) for spill reuse."""
    payload = json.dumps(
        {
            "corpus_id": corpus_id,
            "shards": cfg.num_shards,
            "chunk": cfg.chunk_chars,
            "cap": cfg.max_doc_chars,
            "url_words": cfg.prepend_url_words,
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _split_slices(files: dict, salts: int) -> list[dict]:
    """Partition the run-file map into ``salts`` contiguous slices of
    the SORTED file list — slice order == single-level file order, so
    two-level output is bit-identical."""
    names = sorted(files)
    size = (len(names) + salts - 1) // salts
    out = [
        {n: files[n] for n in names[j * size : (j + 1) * size]}
        for j in range(salts)
    ]
    return [s for s in out if s]


def _partial_path(runs_dir: str, shard_id: int, salt: int) -> str:
    return os.path.join(runs_dir, "partial",
                        f"shard={shard_id}-salt={salt}.arrow")


def _submerge_task(
    batch: pa.Table,
    runs_dir: str,
    slices: list[dict],
    avg_doc_len: float,
    cfg: IndexConfig,
) -> pa.Table:
    """Level 1 of the salted merge: one (shard, slice) partial per row,
    written as an Arrow IPC file under ``runs_dir/partial/``."""
    os.makedirs(os.path.join(runs_dir, "partial"), exist_ok=True)
    shards, salts = [], []
    for shard_id, salt in zip(batch["shard"].to_pylist(),
                              batch["salt"].to_pylist()):
        group = read_shard_runs(runs_dir, slices[salt], shard_id)
        table, _ = build_shard_table(group, 0, avg_doc_len, cfg, raw=True)
        path = _partial_path(runs_dir, shard_id, salt)
        tmp = f"{path}.tmp.{os.getpid()}"
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_stream(f, table.schema) as writer:
            writer.write_table(table)
        os.replace(tmp, path)
        shards.append(shard_id)
        salts.append(salt)
    return pa.table({
        "shard": pa.array(shards, pa.int32()),
        "salt": pa.array(salts, pa.int32()),
    })


def _finalize_task(
    batch: pa.Table,
    runs_dir: str,
    num_salts: int,
    index_dir: str,
    num_documents: int,
    cfg: IndexConfig,
    input_fingerprint: str,
) -> pa.Table:
    """Level 2 of the salted merge: sum dfs, apply idf + prune, write."""
    out = {"shard": [], "terms": [], "postings": [], "bytes": [],
           "wall_ms": []}
    for shard_id in batch["shard"].to_pylist():
        t0 = time.perf_counter()
        partials = []
        for salt in range(num_salts):
            path = _partial_path(runs_dir, shard_id, salt)
            if not os.path.exists(path):
                continue
            with pa.OSFile(path, "rb") as f, \
                    pa.ipc.open_stream(f) as reader:
                partials.append(reader.read_all())
        table, n_postings = finalize_shard_table(
            partials, num_documents, cfg
        )
        nbytes = atomic_write_parquet(
            table, shard_path(index_dir, shard_id),
            row_group_size=cfg.shard_row_group_size)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        write_shard_manifest(
            index_dir,
            ShardManifest(
                partition_id=shard_id,
                input_fingerprint=input_fingerprint,
                row_count=table.num_rows,
                postings_count=n_postings,
                bytes=nbytes,
                wall_ms=wall_ms,
            ),
        )
        out["shard"].append(shard_id)
        out["terms"].append(table.num_rows)
        out["postings"].append(n_postings)
        out["bytes"].append(nbytes)
        out["wall_ms"].append(wall_ms)
    return pa.table({
        "shard": pa.array(out["shard"], pa.int32()),
        "terms": pa.array(out["terms"], pa.int64()),
        "postings": pa.array(out["postings"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.int64()),
        "wall_ms": pa.array(out["wall_ms"], pa.float64()),
    })


def _merge_task(
    batch: pa.Table,
    runs_dir: str,
    files: list[str],
    index_dir: str,
    num_documents: int,
    avg_doc_len: float,
    cfg: IndexConfig,
    input_fingerprint: str,
) -> pa.Table:
    """Build + write every shard id in the batch (normally one)."""
    out = {"shard": [], "terms": [], "postings": [], "bytes": [],
           "wall_ms": []}
    for shard_id in batch["shard"].to_pylist():
        t0 = time.perf_counter()
        group = read_shard_runs(runs_dir, files, shard_id)
        table, n_postings = build_shard_table(
            group, num_documents, avg_doc_len, cfg
        )
        nbytes = atomic_write_parquet(
            table, shard_path(index_dir, shard_id),
            row_group_size=cfg.shard_row_group_size)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        write_shard_manifest(
            index_dir,
            ShardManifest(
                partition_id=shard_id,
                input_fingerprint=input_fingerprint,
                row_count=table.num_rows,
                postings_count=n_postings,
                bytes=nbytes,
                wall_ms=wall_ms,
            ),
        )
        out["shard"].append(shard_id)
        out["terms"].append(table.num_rows)
        out["postings"].append(n_postings)
        out["bytes"].append(nbytes)
        out["wall_ms"].append(wall_ms)
    return pa.table({
        "shard": pa.array(out["shard"], pa.int32()),
        "terms": pa.array(out["terms"], pa.int64()),
        "postings": pa.array(out["postings"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.int64()),
        "wall_ms": pa.array(out["wall_ms"], pa.float64()),
    })


def _merge_shards(
    todo: list[int],
    runs_dir: str,
    files: dict,
    index_dir: str,
    stats: CorpusStats,
    cfg: IndexConfig,
    fingerprint: str,
    merge_salts: int,
) -> None:
    """Stage 2 (shared by build and update): one independent merge task
    per missing shard over the given run-file read plan."""
    import ray.data as rd

    if not todo:
        return
    if merge_salts > 1:
        slices = _split_slices(files, merge_salts)
        sub = rd.from_items(
            [{"shard": k, "salt": j}
             for k in todo for j in range(len(slices))],
            override_num_blocks=len(todo) * len(slices),
        ).map_batches(
            _submerge_task,
            batch_format="pyarrow",
            fn_kwargs={
                "runs_dir": runs_dir,
                "slices": slices,
                "avg_doc_len": stats.avg_doc_len,
                "cfg": cfg,
            },
        ).to_pandas()
        assert len(sub) == len(todo) * len(slices)
        summary = rd.from_items(
            [{"shard": k} for k in todo],
            override_num_blocks=len(todo),
        ).map_batches(
            _finalize_task,
            batch_format="pyarrow",
            fn_kwargs={
                "runs_dir": runs_dir,
                "num_salts": len(slices),
                "index_dir": index_dir,
                "num_documents": stats.num_documents,
                "cfg": cfg,
                "input_fingerprint": fingerprint,
            },
        ).to_pandas()
    else:
        summary = rd.from_items(
            [{"shard": k} for k in todo],
            override_num_blocks=len(todo),
        ).map_batches(
            _merge_task,
            batch_format="pyarrow",
            fn_kwargs={
                "runs_dir": runs_dir,
                "files": files,
                "index_dir": index_dir,
                "num_documents": stats.num_documents,
                "avg_doc_len": stats.avg_doc_len,
                "cfg": cfg,
                "input_fingerprint": fingerprint,
            },
        ).to_pandas()
    assert len(summary) == len(todo)


def build_index(
    corpus_ds,
    index_dir: str,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    corpus_id: str = "",
    tokenizer_concurrency=None,
    tokenizer_batch_size: int | None = None,
    keep_runs: bool = False,
    merge_salts: int = 1,
) -> BuildResult:
    """Build (or resume) the sharded index from a corpus Dataset.

    ``merge_salts > 1`` enables the salted two-level merge (SURVEY §4
    skew handling): level 1 builds per-(shard, file-slice) RAW partials
    in parallel — a pathologically hot shard's byte work splits S ways
    — and level 2 sums dfs, applies idf + the df prune, and writes the
    shard.  Output is bit-identical to the single-level merge."""
    os.makedirs(index_dir, exist_ok=True)
    runs_dir = os.path.join(index_dir, "_runs")

    # fast path: this exact (corpus, cfg) is already fully built
    meta_path = os.path.join(index_dir, META_FILE)
    if os.path.exists(meta_path):
        meta = read_meta(index_dir)
        prior = CorpusStats(
            num_documents=meta["num_documents"],
            avg_doc_len=meta["avg_doc_len"],
            num_indexed=meta["num_indexed"],
        )
        fp = _fingerprint(prior, cfg, corpus_id)
        if fp == meta.get("fingerprint"):
            done = completed_shards(index_dir, fp)
            if len(done) == cfg.num_shards:
                manifests = read_manifests(index_dir)
                return BuildResult(
                    index_dir=index_dir,
                    stats=prior,
                    fingerprint=fp,
                    shards_built=0,
                    shards_skipped=len(done),
                    terms=sum(m.row_count for m in manifests.values()),
                    postings=sum(m.postings_count
                                 for m in manifests.values()),
                    bytes=sum(m.bytes for m in manifests.values()),
                )

    # stage 1: spill (tokenize + stats in one pass; reused on resume)
    stats = spill_runs(
        corpus_ds, runs_dir, cfg,
        spill_key=_spill_key(cfg, corpus_id),
        batch_size=tokenizer_batch_size,
    )
    fingerprint = _fingerprint(stats, cfg, corpus_id)
    done = completed_shards(index_dir, fingerprint)
    todo = [k for k in range(cfg.num_shards) if k not in done]

    # stage 2: merge — one independent task per missing shard
    _merge_shards(todo, runs_dir, spilled_files(runs_dir), index_dir,
                  stats, cfg, fingerprint, merge_salts)

    write_meta(index_dir, stats, cfg, fingerprint, corpus_id=corpus_id,
               char_sum=spill_manifest(runs_dir).get("char_sum"))
    if not keep_runs:
        shutil.rmtree(runs_dir, ignore_errors=True)

    manifests = read_manifests(index_dir)
    return BuildResult(
        index_dir=index_dir,
        stats=stats,
        fingerprint=fingerprint,
        shards_built=len(todo),
        shards_skipped=len(done),
        terms=sum(m.row_count for m in manifests.values()),
        postings=sum(m.postings_count for m in manifests.values()),
        bytes=sum(m.bytes for m in manifests.values()),
    )


def _delta_dirs(runs_dir: str) -> list[str]:
    """Spilled delta subdirs (``delta=<key>``), sorted for determinism."""
    if not os.path.isdir(runs_dir):
        return []
    return sorted(
        d for d in os.listdir(runs_dir)
        if d.startswith("delta=")
        and os.path.exists(os.path.join(runs_dir, d, SPILL_MANIFEST))
    )


def union_plan(runs_dir: str) -> tuple[CorpusStats, int, dict]:
    """EXACT union stats + run-file read plan over base + all deltas.

    Shared by :func:`update_index` and :func:`~.delete.purge_deletes`:
    integer char sums from the spill manifests make the recomputed
    ``avg_doc_len`` bit-identical to a from-scratch build's division.
    Returns ``(stats, char_sum, files)`` with delta files prefixed
    ``<delta_dir>/``.
    """
    count = char_sum = indexed = 0
    files: dict[str, dict] = {}
    for sub in [""] + _delta_dirs(runs_dir):
        sub_dir = os.path.join(runs_dir, sub) if sub else runs_dir
        m = spill_manifest(sub_dir)
        st = m["stats"]
        count += st["num_documents"]
        indexed += st["num_indexed"]
        char_sum += m.get(
            "char_sum",  # pre-update manifests: closest reconstruction
            round(st["avg_doc_len"] * st["num_documents"]))
        for name, segs in spilled_files(sub_dir).items():
            files[f"{sub}/{name}" if sub else name] = segs
    stats = CorpusStats(
        num_documents=count,
        avg_doc_len=(char_sum / count) if count else 0.0,
        num_indexed=indexed,
    )
    return stats, char_sum, files


def combined_corpus_id(meta: dict, runs_dir: str) -> str:
    """Corpus identity = base id + applied deltas + purge history,
    derived from the runs tree + meta so re-runs and chained
    updates/purges fingerprint stably."""
    base = "+".join([meta.get("corpus_id", ""), *_delta_dirs(runs_dir)])
    purges = meta.get("purge_history") or []
    return base + "".join(f"~purge:{t}" for t in purges)


def update_index(
    delta_ds,
    index_dir: str,
    delta_id: str,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    tokenizer_batch_size: int | None = None,
    merge_salts: int = 1,
) -> BuildResult:
    """Incrementally ADD documents to an existing index.

    The storage-shuffle layout makes this cheap: the expensive pass
    (tokenize + spill, linear in corpus bytes) runs over the DELTA
    only; the merge stage then rebuilds each shard from the union of
    base + delta run files.  Every shard is re-merged because the BM25
    per-posting scores depend on the global corpus stats (N, avg doc
    length — reference ``indexing.py:162-171``), which the update
    recomputes EXACTLY (integer char sums from the spill manifests),
    so the result is logically identical — same terms, df, idf,
    per-posting scores and positions — to a from-scratch build over
    the union corpus.  (Shard parquet bytes may differ: posting-list
    SEGMENT order follows run-file order, which is doc-order-free by
    design — see stages/postings.py.)

    Requirements / semantics:
    - the base index must have been built with ``keep_runs=True`` (the
      retained runs ARE the tokenized corpus representation; at scale
      they live on shared storage next to the shards),
    - ``delta_id`` names this batch of additions; re-running with the
      same (delta_id, delta) is idempotent (spill manifest + shard
      fingerprints short-circuit), a new delta_id appends more docs,
    - ADD-only: delta doc_ids/urls must be new — upserting an existing
      url is ``pipelines/delete.delete_docs`` (tombstone the old ids)
      + this update with the new versions + ``purge_deletes`` (the
      reference has no delete path at all; its crawler-side upsert,
      WebCrawler_basis.py:246-252, happens before indexing),
    - resumable exactly like ``build_index``: a crash re-uses the
      delta spill and skips already-merged shards.
    """
    if not delta_id:
        raise ValueError("update_index needs a non-empty delta_id "
                         "(it keys the delta's spill for resume)")
    meta_path = os.path.join(index_dir, META_FILE)
    if not os.path.exists(meta_path):
        raise ValueError(f"no index at {index_dir} (missing {META_FILE}); "
                         "build_index first")
    meta = read_meta(index_dir)
    if meta["num_shards"] != cfg.num_shards:
        raise ValueError(
            f"cfg.num_shards={cfg.num_shards} != indexed "
            f"{meta['num_shards']}: shard routing would change")
    runs_dir = os.path.join(index_dir, "_runs")
    if not os.path.exists(os.path.join(runs_dir, SPILL_MANIFEST)):
        raise ValueError(
            "base spill runs not found — build_index(..., keep_runs=True) "
            "is required for incremental updates")

    # stage 1: spill the delta only (its own subdir + spill manifest)
    delta_key = _spill_key(cfg, f"delta:{delta_id}")
    delta_sub = f"delta={delta_key[:12]}"
    spill_runs(
        delta_ds, os.path.join(runs_dir, delta_sub), cfg,
        spill_key=delta_key, batch_size=tokenizer_batch_size,
    )

    # stage 2: re-merge shards over the union of run files
    return _remerge_union(index_dir, cfg, merge_salts)


def _remerge_union(index_dir: str, cfg: IndexConfig,
                   merge_salts: int = 1) -> BuildResult:
    """Re-merge every shard over the union of ALL run files currently
    in the index's runs tree (base + deltas), recomputing the global
    corpus stats exactly from the integer char sums.  Shared tail of
    :func:`update_index` and :func:`merge_indexes`.

    Meta keeps the BASE corpus_id: the combined id is always derived
    from base + the delta dirs present, so further updates chain
    (purge_history carries through so post-purge updates fingerprint
    distinctly from a never-purged path)."""
    runs_dir = os.path.join(index_dir, "_runs")
    meta = read_meta(index_dir)
    stats, char_sum, files = union_plan(runs_dir)
    combined_id = combined_corpus_id(meta, runs_dir)
    fingerprint = _fingerprint(stats, cfg, combined_id)
    done = completed_shards(index_dir, fingerprint)
    todo = [k for k in range(cfg.num_shards) if k not in done]
    _merge_shards(todo, runs_dir, files, index_dir, stats, cfg,
                  fingerprint, merge_salts)

    extra = {}
    if meta.get("purge_history"):
        extra["purge_history"] = meta["purge_history"]
    write_meta(index_dir, stats, cfg, fingerprint,
               corpus_id=meta.get("corpus_id", ""), char_sum=char_sum,
               extra=extra)

    manifests = read_manifests(index_dir)
    return BuildResult(
        index_dir=index_dir,
        stats=stats,
        fingerprint=fingerprint,
        shards_built=len(todo),
        shards_skipped=len(done),
        terms=sum(m.row_count for m in manifests.values()),
        postings=sum(m.postings_count for m in manifests.values()),
        bytes=sum(m.bytes for m in manifests.values()),
    )


#: meta fields that must agree for two indexes' run files to be
#: mergeable — they parameterize the spill (tokenize + shard routing),
#: i.e. the run files themselves.  k1/b/min_df are merge-time knobs
#: and come from ``cfg``.
_SPILL_META_FIELDS = ("num_shards", "chunk_chars", "prepend_url_words")


def merge_indexes(
    base_dir: str,
    other_dirs,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    merge_salts: int = 1,
    id_check: str = "range",
) -> BuildResult:
    """Merge independently built indexes INTO ``base_dir`` — the
    Lucene ``IndexWriter.addIndexes`` analogue (the reference, like
    most single-process engines, only rebuilds from scratch:
    indexing.py:186-188).

    Scale rationale: the expensive pass (tokenize + spill, linear in
    corpus bytes) already ran inside each source index.  Merging
    grafts the sources' RETAINED RUN FILES into the base's runs tree
    as delta dirs — hardlinked when the filesystem allows (on a real
    cluster the runs live on shared storage and the graft is a
    metadata move), copied otherwise — then re-merges each shard over
    the union, recomputing the global BM25 stats EXACTLY from the
    integer char sums.  The result is logically identical (same
    terms, df, idf, per-posting scores and positions) to a
    from-scratch build over the concatenated corpora, so per-partition
    index builds can run as fully independent jobs and be combined
    afterwards.

    Requirements / semantics:
    - every participating index was built with ``keep_runs=True``,
    - identical spill-affecting config everywhere (num_shards,
      chunk_chars, prepend_url_words — checked against each meta),
    - doc_ids globally disjoint across sources, verified per
      ``id_check``: ``"range"`` (default) compares the spill
      manifests' [min, max] doc-id ranges — free, and exact for the
      common contiguous-range partitioning; ``"exact"`` reads the
      per-doc docstats segments (the purge's exact-stat ledger, one
      int64 row per doc — a metadata-scale pass) and intersects the
      actual id sets, the right mode for url-HASH doc ids whose ranges
      always interleave; ``"off"`` skips the check (the caller owns
      the guarantee),
    - idempotent: the grafted delta is keyed by the source's spill
      identity, so re-merging the same source (or crashing and
      re-running) reuses the graft and the shard fingerprints
      short-circuit the merge.
    """
    meta = read_meta(base_dir)
    if meta["num_shards"] != cfg.num_shards:
        raise ValueError(
            f"cfg.num_shards={cfg.num_shards} != indexed "
            f"{meta['num_shards']}: shard routing would change")
    runs_dir = os.path.join(base_dir, "_runs")
    if not os.path.exists(os.path.join(runs_dir, SPILL_MANIFEST)):
        raise ValueError(
            "base spill runs not found — build_index(..., keep_runs=True) "
            "is required for index merging")

    def source_subs(idx_dir: str) -> list[tuple[str, dict]]:
        """(src_dir, spill manifest) for the base runs + every delta."""
        rdir = os.path.join(idx_dir, "_runs")
        out = []
        for sub in [""] + _delta_dirs(rdir):
            sdir = os.path.join(rdir, sub) if sub else rdir
            out.append((sdir, spill_manifest(sdir)))
        return out

    others = []
    for other in other_dirs:
        ometa = read_meta(other)
        for fld in _SPILL_META_FIELDS:
            if ometa.get(fld) != meta.get(fld):
                raise ValueError(
                    f"{other}: {fld}={ometa.get(fld)!r} != base "
                    f"{meta.get(fld)!r}: run files are not mergeable")
        oruns = os.path.join(other, "_runs")
        if not os.path.exists(os.path.join(oruns, SPILL_MANIFEST)):
            raise ValueError(
                f"{other}: spill runs not found — build_index(..., "
                "keep_runs=True) is required for index merging")
        others.append(other)

    if id_check not in ("range", "exact", "off"):
        raise ValueError(f"id_check={id_check!r}: expected "
                         "'range', 'exact' or 'off'")
    if id_check != "off":
        # one entry per spill sub, deduplicated by spill key: a source
        # already grafted into the base tree (replay/idempotent re-run)
        # is the SAME corpus, not an overlap
        seen: set[str] = set()
        subs = []
        for idx_dir in [base_dir, *others]:
            for sdir, m in source_subs(idx_dir):
                if m["spill_key"] in seen:
                    continue
                seen.add(m["spill_key"])
                subs.append((sdir, m))
        if id_check == "range":
            spans = []
            for sdir, m in subs:
                ranges = list(m.get("doc_ranges", {}).values())
                if ranges:
                    spans.append((sdir, min(r[0] for r in ranges),
                                  max(r[1] for r in ranges)))
            spans.sort(key=lambda s: s[1])
            for (da, _, hi_a), (db, lo_b, _) in zip(spans, spans[1:]):
                if lo_b <= hi_a:
                    raise ValueError(
                        f"doc-id ranges of {da} and {db} overlap "
                        f"([..,{hi_a}] vs [{lo_b},..]); merged indexes "
                        "need disjoint doc_ids — use id_check='exact' "
                        "for interleaved id spaces (url-hash doc ids), "
                        "or 'off' if the caller owns the guarantee")
        else:  # exact: intersect the actual docstats id sets
            import numpy as np

            from ..stages.spill import read_segment

            union = np.empty(0, np.int64)
            for sdir, m in subs:
                parts = [
                    read_segment(sdir, name, seg)["doc_id"].to_numpy()
                    for name, seg in m.get("doc_segments", {}).items()
                ]
                ids = (np.unique(np.concatenate(parts)) if parts
                       else np.empty(0, np.int64))
                dup = np.intersect1d(union, ids, assume_unique=True)
                if dup.size:
                    raise ValueError(
                        f"{sdir} shares {dup.size} doc_id(s) with the "
                        f"other sources (e.g. {dup[:3].tolist()}); "
                        "merged indexes need disjoint doc_ids")
                union = np.union1d(union, ids)

    # graft: copy/link each source sub (its runs + manifest) into the
    # base runs tree as a delta dir keyed by the source's spill key
    for other in others:
        for src_dir, m in source_subs(other):
            key = m["spill_key"]
            dst_sub = f"delta={hashlib.md5(f'graft:{key}'.encode()).hexdigest()[:12]}"
            dst_dir = os.path.join(runs_dir, dst_sub)
            dst_manifest = os.path.join(dst_dir, SPILL_MANIFEST)
            if os.path.exists(dst_manifest):
                with open(dst_manifest) as f:
                    if json.load(f).get("spill_key") == key:
                        continue  # already grafted (idempotent re-run)
                raise ValueError(
                    f"delta dir {dst_sub} exists with a different "
                    f"spill key — runs tree of {base_dir} is inconsistent")
            os.makedirs(dst_dir, exist_ok=True)
            names = set(m["file_segments"]) | set(m.get("doc_segments", {}))
            for name in sorted(names):
                dst = os.path.join(dst_dir, name)
                if os.path.exists(dst):
                    continue
                tmp = f"{dst}.tmp.{os.getpid()}"
                try:
                    os.link(os.path.join(src_dir, name), tmp)
                except OSError:
                    shutil.copy2(os.path.join(src_dir, name), tmp)
                os.replace(tmp, dst)
            # manifest LAST: its presence marks the graft complete
            # (_delta_dirs ignores manifest-less dirs, so a crashed
            # graft is invisible and simply redone)
            tmp = f"{dst_manifest}.tmp.{os.getpid()}"
            shutil.copy2(os.path.join(src_dir, SPILL_MANIFEST), tmp)
            os.replace(tmp, dst_manifest)

    return _remerge_union(base_dir, cfg, merge_salts)
