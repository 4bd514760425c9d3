"""Page-table readers: ingest Common-Crawl-style pages from multiple
formats into the canonical input_hint schema
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Parquet is the native format (self-describing, column-prunable — the
engine's own lineage).  JSONL and CSV ingestion cover the
interchange formats crawl dumps commonly arrive in; both coerce into
the canonical Arrow schema in a ``map_batches`` pass so every
downstream stage sees identical types:

- ``warc_ts``: ISO-8601 string -> timestamp[us]
- ``html``: base64 string -> binary (JSON/CSV cannot carry raw bytes)
- missing ``text`` / ``lang`` columns materialize as nulls (the
  extract stage recomputes them anyway)
"""

from __future__ import annotations

import base64
import datetime

import pyarrow as pa

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _coerce_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    names = set(batch.column_names)

    def col(name):
        return batch[name] if name in names else None

    urls = col("url")
    if urls is None:
        raise ValueError("pages input must have a url column")

    ts = col("warc_ts")
    if ts is None:
        ts_arr = pa.nulls(n, pa.timestamp("us"))
    elif pa.types.is_timestamp(ts.type):
        ts_arr = ts.cast(pa.timestamp("us"))
    else:
        ts_arr = pa.array(
            [datetime.datetime.fromisoformat(v) if v else None
             for v in ts.to_pylist()],
            pa.timestamp("us"),
        )

    html = col("html")
    if html is None:
        html_arr = pa.nulls(n, pa.binary())
    elif pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html_arr = html.cast(pa.binary())
    else:
        html_arr = pa.array(
            [base64.b64decode(v) if v else None for v in html.to_pylist()],
            pa.binary(),
        )

    text = col("text")
    text_arr = (text.cast(pa.string()) if text is not None
                else pa.nulls(n, pa.string()))
    lang = col("lang")
    lang_arr = (lang.cast(pa.string()) if lang is not None
                else pa.nulls(n, pa.string()))

    return pa.table({
        "url": urls.cast(pa.string()),
        "warc_ts": ts_arr,
        "html": html_arr,
        "text": text_arr,
        "lang": lang_arr,
    }, schema=PAGES_SCHEMA)


def read_pages(path: str, format: str = "parquet", **read_kwargs):
    """Pages Dataset in the canonical schema from parquet/jsonl/csv."""
    import ray.data as rd

    if format == "parquet":
        ds = rd.read_parquet(path, **read_kwargs)
    elif format in ("jsonl", "json"):
        ds = rd.read_json(path, **read_kwargs)
    elif format == "csv":
        ds = rd.read_csv(path, **read_kwargs)
    else:
        raise ValueError(f"unsupported pages format: {format}")
    return ds.map_batches(_coerce_batch, batch_format="pyarrow")


def write_pages_jsonl(table: pa.Table, path: str) -> str:
    """Inverse helper (tests / interchange): canonical pages table ->
    JSONL with base64 html and ISO timestamps."""
    import json

    with open(path, "w") as f:
        for row in table.to_pylist():
            f.write(json.dumps({
                "url": row["url"],
                "warc_ts": row["warc_ts"].isoformat()
                if row["warc_ts"] is not None else None,
                "html": base64.b64encode(row["html"]).decode()
                if row["html"] is not None else None,
                "text": row["text"],
                "lang": row["lang"],
            }) + "\n")
    return path
