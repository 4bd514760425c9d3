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


# ---------------------------------------------------------------------------
# WARC ingestion (ISO 28500 — the format Common Crawl actually ships)
# ---------------------------------------------------------------------------

def _parse_warc_stream(stream):
    """Yield (url, warc_ts, html_bytes) from a WARC byte stream.

    Minimal from-scratch ISO 28500 parser: version line, CRLF headers,
    ``Content-Length``-byte block, two-CRLF record separator.  Only
    ``WARC-Type: response`` records yield pages (warcinfo / request /
    metadata records are skipped); the HTTP response framing inside the
    block is stripped to its body.  Parsing is sequential with one
    record in memory at a time, so a 1 GB crawl segment streams."""
    import datetime as _dt

    while True:
        # skip blank separator lines between records
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record header: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            key, _, value = hline.decode("utf-8", "replace").partition(":")
            headers[key.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date")
        ts = None
        if ts_raw:
            ts = _dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00")) \
                .replace(tzinfo=None)
        # strip HTTP response framing (status line + headers) when present
        sep = block.find(b"\r\n\r\n")
        body = block[sep + 4:] if sep >= 0 else block
        yield url, ts, body


def iter_warc_responses(path: str):
    """Iterate (url, warc_ts, html) response records of one WARC file.

    ``.gz`` paths open through gzip — Python's gzip module reads
    multi-member files (Common Crawl writes one member per record)
    transparently as one stream."""
    import gzip
    import io

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as raw:
        yield from _parse_warc_stream(io.BufferedReader(raw))


def read_pages_warc(paths, records_per_batch: int = 1000):
    """Pages Dataset in the canonical schema from WARC file(s).

    One read task per file (the Common-Crawl unit of parallelism — a
    crawl is ~64k independent .warc.gz segments); each task streams its
    file and YIELDS a batch every ``records_per_batch`` records, so a
    task's memory is bounded by the batch, not the segment.  ``text`` /
    ``lang`` come back null — the extract stage computes them."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table):
        def flush(rows):
            return pa.table({
                "url": pa.array(rows["url"], pa.string()),
                "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
                "html": pa.array(rows["html"], pa.binary()),
                "text": pa.nulls(len(rows["url"]), pa.string()),
                "lang": pa.nulls(len(rows["url"]), pa.string()),
            }, schema=PAGES_SCHEMA)

        for path in batch["path"].to_pylist():
            rows = {"url": [], "warc_ts": [], "html": []}
            for url, ts, html in iter_warc_responses(path):
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html)
                if len(rows["url"]) >= records_per_batch:
                    yield flush(rows)
                    rows = {"url": [], "warc_ts": [], "html": []}
            if rows["url"]:
                yield flush(rows)

    paths_ds = rd.from_items([{"path": p} for p in paths]) \
        .repartition(len(paths))
    return paths_ds.map_batches(parse, batch_format="pyarrow")


def write_warc(table: pa.Table, path: str, per_record_gzip: bool = True) -> str:
    """Inverse helper (tests / interchange): canonical pages table ->
    WARC file of response records.  ``per_record_gzip`` writes one gzip
    member per record (the Common Crawl convention) so readers must
    handle multi-member files."""
    import gzip
    import io

    def one_record(row) -> bytes:
        body = row["html"] or b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)
        ts = row["warc_ts"]
        iso = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
               if ts is not None else "1970-01-01T00:00:00Z")
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: {row['url']}\r\n"
                f"WARC-Date: {iso}\r\n"
                f"Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n"
                f"\r\n").encode()
        return head + http + b"\r\n\r\n"

    with open(path, "wb") as f:
        for row in table.to_pylist():
            rec = one_record(row)
            if per_record_gzip:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                    gz.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
    return path
