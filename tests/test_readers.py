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


class TestWarcReader:
    """From-scratch ISO 28500 ingestion: the format Common Crawl ships."""

    def test_warc_roundtrip_schema_and_extract(self, ray_session,
                                               pages_table, tmp_path):
        from modernsearchengines_ray.sources.readers import (
            PAGES_SCHEMA,
            read_pages_warc,
            write_warc,
        )
        from modernsearchengines_ray.stages.extract import extract_pages

        path = str(tmp_path / "segment-00000.warc.gz")
        write_warc(pages_table, path, per_record_gzip=True)
        ds = read_pages_warc(path)
        assert ds.schema().names == PAGES_SCHEMA.names
        got = ds.to_pandas()
        assert len(got) == pages_table.num_rows
        want = pages_table.to_pandas()
        assert sorted(got["url"]) == sorted(want["url"])
        # html bytes survive the HTTP + WARC framing exactly
        gm = got.set_index("url")["html"]
        wm = want.set_index("url")["html"]
        for url in gm.index:
            assert gm[url] == wm[url], url
        # and therefore extraction matches the oracle text byte-for-byte
        extracted = extract_pages(read_pages_warc(path)) \
            .to_pandas().set_index("url")["text"]
        wt = want.set_index("url")["text"]
        for url in extracted.index:
            assert extracted[url] == wt[url]

    def test_multi_file_and_batching(self, ray_session, pages_table,
                                     tmp_path):
        from modernsearchengines_ray.sources.readers import (
            read_pages_warc,
            write_warc,
        )

        tab1 = pages_table.slice(0, 120)
        tab2 = pages_table.slice(120)
        p1 = str(tmp_path / "seg-1.warc.gz")
        p2 = str(tmp_path / "seg-2.warc")
        write_warc(tab1, p1, per_record_gzip=True)
        write_warc(tab2, p2, per_record_gzip=False)  # plain WARC too
        ds = read_pages_warc([p1, p2], records_per_batch=50)
        assert ds.count() == pages_table.num_rows

    def test_non_response_records_skipped(self, tmp_path):
        from modernsearchengines_ray.sources.readers import (
            iter_warc_responses,
        )

        info = (b"WARC/1.0\r\n"
                b"WARC-Type: warcinfo\r\n"
                b"Content-Length: 9\r\n"
                b"\r\n"
                b"info-body\r\n\r\n")
        resp_http = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
        resp = (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: http://e.example/a\r\n"
                b"WARC-Date: 2024-05-01T00:00:00Z\r\n"
                + f"Content-Length: {len(resp_http)}\r\n".encode()
                + b"\r\n" + resp_http + b"\r\n\r\n")
        path = str(tmp_path / "mixed.warc")
        with open(path, "wb") as f:
            f.write(info + resp)
        got = list(iter_warc_responses(path))
        assert len(got) == 1
        url, ts, html = got[0]
        assert url == "http://e.example/a"
        assert ts.year == 2024
        assert html == b"<html>x</html>"
