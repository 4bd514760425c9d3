"""Deterministic synthetic Common-Crawl-style page source.

Generates the BASELINE.json input_hint table
``(url, warc_ts, html, text, lang)`` at arbitrary scale as a Ray
Dataset: each page's RNG is seeded by ``(seed, page_index)``, so the
output is byte-deterministic regardless of parallelism, block layout or
cluster size — the property the scaling benchmark needs (identical
input at N and 4N parallelism) and the property a 10^12-row synthetic
table needs (no sequential generator state).

``text`` is computed by the shared extractor (the oracle column, same
rule as tests/fixtures.py); ``heavy`` controls paragraphs per page to
emulate realistic Common-Crawl text weights (~3-8 KB of HTML).
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa

from ..functions.html_extract import extract_page

_VOCAB = (
    "castle river market old town museum garden bridge student university "
    "lecture library chocolate festival punt boat tower church cobble "
    "street bakery cafe coffee cake swabian dumpling cheese noodle wine "
    "cellar hill forest walk trail view sunset panorama history medieval "
    "manuscript press book print philosophy seminar physics lab cyber "
    "valley research institute clinic hospital botanical stone gate wall "
    "attraction visit tour guide ticket opening hour entrance free price "
    "restaurant kitchen menu dish taste regional season ingredient fresh "
    "local farmer vineyard apple juice brewery beer garden terrace food "
    "drink dinner lunch breakfast snack dessert excellent delicious"
).split()

_TUEB = ("tübingen", "tuebingen", "hohentübingen", "lustnau", "derendingen")
_LANGS = ("en", "en", "en", "en-US", "de", None)
_EPOCH = datetime.datetime(2024, 6, 1)


def _sentence(rng: random.Random, tueb: bool) -> str:
    words = [rng.choice(_VOCAB) for _ in range(rng.randint(5, 14))]
    if tueb and rng.random() < 0.3:
        words.insert(rng.randrange(len(words)), rng.choice(_TUEB))
    if rng.random() < 0.08:
        words.append(f"{rng.randint(1, 2000)},{rng.randint(100, 999)}")
    if rng.random() < 0.08:
        words.append(f"{rng.randint(1, 30)}{rng.choice(['st', 'nd', 'rd', 'th'])}")
    if rng.random() < 0.05:
        words.append("www.example-site.de/info.html")
    return " ".join(words)


def generate_page(index: int, seed: int = 42, heavy: int = 1) -> dict:
    """One deterministic page; independent of every other index."""
    rng = random.Random(seed * 0x9E3779B1 + index)
    tueb = rng.random() < 0.4
    paragraphs = []
    for _ in range(rng.randint(2 * heavy, 6 * heavy)):
        sents = ". ".join(_sentence(rng, tueb) for _ in range(rng.randint(2, 6)))
        paragraphs.append(f"<p>\n  {sents}.\n</p>")
    if rng.random() < 0.2:
        paragraphs.append("<script>var x = 1; // tracker\n</script>")
    if rng.random() < 0.25:
        paragraphs.append("<!-- nav -->")
    if rng.random() < 0.3:
        paragraphs.append("<div>Fish &amp; Chips &lt;daily&gt;   </div>")
    lang = rng.choice(_LANGS)
    lang_attr = f' lang="{lang}"' if lang is not None else ""
    title = f"<title>Page {index} — Tübingen &amp; around</title>" \
        if rng.random() < 0.85 else ""
    html = (
        f"<!DOCTYPE html>\n<html{lang_attr}>\n<head>{title}</head>\n"
        f"<body>\n" + "\n".join(paragraphs) + "\n</body>\n</html>"
    )
    url = f"https://www.site{index % 9973}.example.com/page-{index}"
    text, page_lang, _ = extract_page(html, url)
    return {
        "url": url,
        "warc_ts": _EPOCH + datetime.timedelta(seconds=index * 7),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": page_lang,
    }


def _gen_batch(batch, seed: int, heavy: int) -> pa.Table:
    rows = [generate_page(int(i), seed, heavy) for i in batch["id"]]
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def synth_pages_dataset(n: int, seed: int = 42, heavy: int = 1):
    """Ray Dataset of n deterministic pages (parallel generation)."""
    import ray.data as rd

    ds = rd.range(n)
    return ds.map_batches(
        lambda b: _gen_batch(b, seed, heavy),
        batch_format="numpy",
        batch_size=512,
    )


def materialize_pages_parquet(path: str, n: int, seed: int = 42,
                              heavy: int = 1) -> str:
    """Generate once to a parquet dir (idempotent cache for benchmarks)."""
    import os

    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return path
    tmp = path + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    synth_pages_dataset(n, seed, heavy).write_parquet(tmp)
    os.replace(tmp, path)
    return path
