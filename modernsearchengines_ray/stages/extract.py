"""HTML -> text extraction stage (reference M1-M3, SURVEY.md §2.2).

A stateless ``map_batches`` task over Arrow batches: per row, parse the
``html`` binary column once and emit ``text`` / ``lang`` / ``site``
(plus the reference's ``relevant`` english flag,
/root/reference/WebCrawler_basis.py:225-227).  HTML parsing is
inherently per-row CPU work (like the reference's BeautifulSoup call);
the batch loop is the parser loop, everything around it stays Arrow.

The ``html`` column is dropped in the output — wide binary payloads
must not travel past the stage that consumes them (SURVEY.md §7 hard
part 6).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html_extract import extract_page

#: url suffixes the reference filters out (WebCrawler_basis.py:213-214,
#: topic.py:156-174)
_SKIP_SUFFIXES = (".jpg", ".png", ".pdf")


def extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts, langs, sites, relevant = [], [], [], []
    for url, html in zip(urls, htmls):
        text, lang, site = extract_page(html, url)
        texts.append(text)
        langs.append(lang)
        sites.append(site)
        relevant.append(lang.startswith("en"))
    out = {
        "url": batch["url"],
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "site": pa.array(sites, pa.string()),
        "relevant": pa.array(relevant, pa.bool_()),
    }
    if "warc_ts" in batch.column_names:
        out["warc_ts"] = batch["warc_ts"]
    return pa.table(out)


def extract_with_simhash(batch: pa.Table) -> pa.Table:
    """Extract + 64-bit simhash of the extracted text, one pass.

    Folding the dedup fingerprint into the extraction pass means the
    dedup winner election later reads only the (simhash, url, lang)
    columns of the extracted parquet — column-pruned and ~50x smaller
    than re-reading text (SURVEY.md §2.7 D1 + the prune-at-the-read
    rule)."""
    from ..functions.simhash import simhash64

    out = extract_batch(batch)
    hashes = [simhash64(t) for t in out["text"].to_pylist()]
    return out.append_column("simhash", pa.array(hashes, pa.uint64()))


def filter_url_extensions(batch: pa.Table) -> pa.Table:
    """Drop image/pdf urls (reference M6) — vectorized-enough suffix check."""
    urls = batch["url"].to_pylist()
    mask = pa.array([not u.endswith(_SKIP_SUFFIXES) for u in urls], pa.bool_())
    return batch.filter(mask)


def extract_pages(ds, concurrency: int | None = None):
    """pages(url, warc_ts, html, ...) -> (url, text, lang, site, relevant[, warc_ts])."""
    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(filter_url_extensions, **{"batch_format": "pyarrow"}) \
             .map_batches(extract_batch, **kwargs)
