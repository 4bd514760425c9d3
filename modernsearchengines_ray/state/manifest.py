"""Per-partition lineage manifest — the checkpoint/resume unit.

The reference's only checkpoint is the crawler pickling (frontier,
visited) after every page (/root/reference/WebCrawler_basis.py:13-24,
254-258); its index build has no resume at all (indexing.py:186-188).
Here every index shard partition writes, atomically (tmp + rename):

  <index_dir>/shard=<k>.parquet          the posting data
  <index_dir>/_manifest/shard_<k>.json   {partition_id, input_fingerprint,
                                          row_count, postings_count,
                                          bytes, wall_ms}

Resume = read the manifest dir, keep entries whose fingerprint matches
the current input, and filter those shards out of the build *before*
the shuffle — completed partitions are never rebuilt, and the metrics
(rows/bytes/wall) come free from the same files.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass
class ShardManifest:
    partition_id: int
    input_fingerprint: str
    row_count: int          # surviving terms in the shard
    postings_count: int     # postings before term-row packing
    bytes: int              # shard parquet size on disk
    wall_ms: float


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifest")


def shard_path(index_dir: str, shard_id: int) -> str:
    return os.path.join(index_dir, f"shard={shard_id}.parquet")


def write_shard_manifest(index_dir: str, entry: ShardManifest) -> None:
    mdir = manifest_dir(index_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"shard_{entry.partition_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, path)


def read_manifests(index_dir: str) -> dict[int, ShardManifest]:
    mdir = manifest_dir(index_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, ShardManifest] = {}
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("shard_") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            data = json.load(f)
        entry = ShardManifest(**data)
        out[entry.partition_id] = entry
    return out


def completed_shards(index_dir: str, input_fingerprint: str) -> set[int]:
    """Shards already built for THIS input (fingerprint match + file present)."""
    done = set()
    for shard_id, entry in read_manifests(index_dir).items():
        if entry.input_fingerprint == input_fingerprint and os.path.exists(
            shard_path(index_dir, shard_id)
        ):
            done.add(shard_id)
    return done


def atomic_write_parquet(table, path: str,
                         row_group_size: int | None = None) -> int:
    """Write parquet via tmp + rename; returns bytes written.

    ``row_group_size=None`` keeps pyarrow's default whole-table
    grouping (byte-stable across rounds); a value enables row-group
    granular lazy reads (IndexConfig.shard_row_group_size)."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    if row_group_size is None:
        pq.write_table(table, tmp)
    else:
        pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)
    return os.path.getsize(path)
