"""Multi-format pages ingestion: jsonl/csv coerce to the canonical
input_hint schema and survive the extract stage identically."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest


class TestReaders:
    def test_jsonl_roundtrip_schema_and_extract(
        self, ray_session, pages_table, tmp_path
    ):
        from modernsearchengines_ray.sources.readers import (
            PAGES_SCHEMA,
            read_pages,
            write_pages_jsonl,
        )
        from modernsearchengines_ray.stages.extract import extract_pages

        path = str(tmp_path / "pages.jsonl")
        write_pages_jsonl(pages_table, path)
        ds = read_pages(path, format="jsonl")
        got = ds.take_all()
        assert len(got) == pages_table.num_rows
        sample = ds.schema()
        assert [f for f in sample.names] == PAGES_SCHEMA.names

        # extraction over the jsonl-ingested pages matches the oracle text
        extracted = extract_pages(read_pages(path, format="jsonl")) \
            .to_pandas().set_index("url")["text"]
        want = pages_table.to_pandas().set_index("url")["text"]
        for url in extracted.index:
            assert extracted[url] == want[url]

    def test_parquet_passthrough(self, ray_session, pages_parquet):
        from modernsearchengines_ray.sources.readers import read_pages

        ds = read_pages(pages_parquet, format="parquet")
        row = ds.take(1)[0]
        assert isinstance(row["html"], bytes)
        assert row["warc_ts"] is not None

    def test_missing_url_rejected(self, ray_session, tmp_path):
        import pandas as pd
        import ray
        import ray.data as rd

        from modernsearchengines_ray.sources.readers import _coerce_batch

        import pyarrow as pa

        with pytest.raises(ValueError, match="url"):
            _coerce_batch(pa.table({"html": pa.array([b"x"])}))
