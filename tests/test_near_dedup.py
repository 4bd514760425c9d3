"""Planted-pair gates for stages/dedup.py::near_dedup_incremental —
the incremental NEAR-dedup operator (new docs vs curated snapshot).

Pins: (1) planted near-dups of snapshot docs are dropped and distinct
docs are kept, exactly matching a brute-force shingle-Jaccard
reference (recall 1.0 on >= threshold pairs — the condition the SQL
oracle equality rests on); (2) driver and partitioned tiers agree;
(3) an empty snapshot keeps every new row; (4) sub-shingle docs are
never candidates and always kept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from modernsearchengines_ray.functions.minhash import jaccard
from modernsearchengines_ray.stages.dedup import (
    near_dedup_incremental,
    word_shingles,
)

_WORDS = np.array([f"w{i:02d}" for i in range(40)])


def _doc(rng, n=60):
    return " ".join(rng.choice(_WORDS, size=n))


def _fixture():
    rng = np.random.RandomState(5)
    ref_texts = [_doc(rng) for _ in range(12)]
    new_texts = []
    # 4 near-dups: one word substituted -> Jaccard well above 0.8
    for i in range(4):
        words = ref_texts[i].split()
        words[7] = "zz"
        new_texts.append(" ".join(words))
    # 8 fresh docs, plus one too short to shingle
    new_texts += [_doc(rng) for _ in range(8)] + ["just two"]
    ref = pa.table({
        "doc_id": pa.array(np.arange(100, 100 + len(ref_texts)),
                           pa.int64()),
        "text": pa.array(ref_texts)})
    new = pa.table({
        "doc_id": pa.array(np.arange(len(new_texts)), pa.int64()),
        "text": pa.array(new_texts)})
    return new, ref


def _brute_kept(new: pa.Table, ref: pa.Table, thr=0.8):
    kept = []
    for nid, ntext in zip(new["doc_id"].to_pylist(),
                          new["text"].to_pylist()):
        ns = word_shingles(ntext, 3)
        dup = any(
            round(jaccard(ns, word_shingles(rt, 3)), 6) >= thr
            for rt in ref["text"].to_pylist())
        if not dup:
            kept.append(nid)
    return sorted(kept)


@pytest.mark.parametrize("reduce", ["driver", "partitioned"])
def test_planted_near_dups_dropped(ray_session, reduce):
    import ray.data as rd

    new, ref = _fixture()
    out = near_dedup_incremental(
        rd.from_arrow(new).repartition(3),
        rd.from_arrow(ref).repartition(2), reduce=reduce).to_pandas()
    want = _brute_kept(new, ref)
    assert sorted(out["doc_id"].tolist()) == want
    # the plant is real: some dropped, some kept, shorty kept
    assert len(want) < new.num_rows
    assert new.num_rows - len(want) == 4
    assert int(new["doc_id"][new.num_rows - 1].as_py()) in want


@pytest.mark.parametrize("reduce", ["driver", "partitioned"])
def test_empty_snapshot_keeps_everything(ray_session, reduce):
    import ray.data as rd

    new, ref = _fixture()
    out = near_dedup_incremental(
        rd.from_arrow(new).repartition(3),
        rd.from_arrow(ref.slice(0, 0)), reduce=reduce).to_pandas()
    assert sorted(out["doc_id"].tolist()) == \
        sorted(new["doc_id"].to_pylist())
