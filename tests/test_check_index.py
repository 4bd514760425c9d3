"""Index integrity verification (pipelines/check.py).

A freshly built / updated / purged / compacted index must check clean;
targeted corruptions (wrong df, wrong block-max, wrong manifest
counts) must be detected.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_update_index import _build, _split_corpus, _update


class TestCheckIndex:
    def test_clean_index_through_lifecycle(self, ray_session,
                                           pages_parquet, tmp_path):
        from modernsearchengines_ray.pipelines.check import check_index
        from modernsearchengines_ray.pipelines.compact import compact_index
        from modernsearchengines_ray.pipelines.delete import (
            delete_docs,
            purge_deletes,
        )

        both, base, delta = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(base, idx, "base", keep_runs=True)
        r = check_index(idx)
        assert r["ok"], r["errors"][:3]
        assert r["shards"] == 8 and r["terms"] > 0

        _update(delta, idx, "d1")  # multi-segment terms
        assert check_index(idx)["ok"]

        delete_docs(idx, base["doc_id"].iloc[::9].tolist(), batch_id="b")
        purge_deletes(idx)
        assert check_index(idx)["ok"]

        compact_index(idx)
        r = check_index(idx)
        assert r["ok"], r["errors"][:3]

    def test_detects_corruption(self, ray_session, pages_parquet,
                                tmp_path):
        from modernsearchengines_ray.pipelines.check import check_index
        from modernsearchengines_ray.state.manifest import shard_path

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c")

        # find a shard with rows and break one term's df
        for k in range(8):
            path = shard_path(idx, k)
            t = pq.read_table(path)
            if t.num_rows:
                break
        df_col = t["df"].to_pylist()
        df_col[0] += 1
        t = t.set_column(t.schema.get_field_index("df"),
                         pa.field("df", pa.int64()),
                         pa.array(df_col, pa.int64()))
        pq.write_table(t, path)

        r = check_index(idx)
        assert not r["ok"]
        assert any("seg_lens" in e or "df" in e for e in r["errors"])
        assert any("manifest postings" in e for e in r["errors"])

    def test_detects_missing_shard_manifest(self, ray_session,
                                            pages_parquet, tmp_path):
        from modernsearchengines_ray.pipelines.check import check_index
        from modernsearchengines_ray.state.manifest import manifest_dir

        corpus, _, _ = _split_corpus(pages_parquet)
        idx = str(tmp_path / "idx")
        _build(corpus, idx, "c")
        mdir = manifest_dir(idx)
        victim = sorted(os.listdir(mdir))[0]
        os.remove(os.path.join(mdir, victim))
        r = check_index(idx)
        assert not r["ok"]
        assert any("no manifest" in e for e in r["errors"])
