"""Deterministic synthetic fixtures (FIXTURES.md).

Generates the Common-Crawl-style ``pages`` table per BASELINE.json's
input_hint schema ``(url, warc_ts, html, text, lang)``.  Everything is
driven by ``random.Random(seed)`` — same seed, same bytes, any machine.

The ``text`` column is the oracle column: computed by the shared
extractor (:mod:`modernsearchengines_ray.functions.html_extract`), which
pins the reference expression
``' '.join(soup.stripped_strings).replace('\\n',' ')``
(/root/reference/WebCrawler_basis.py:221-222).  The engine must
reproduce it from ``html`` byte-identically per url.
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa

from modernsearchengines_ray.functions.html_extract import extract_page

VOCAB = (
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

TUEB_WORDS = ("tübingen", "tuebingen", "hohentübingen", "lustnau", "derendingen")

LANG_CHOICES = ("en", "en", "en", "en-US", "de", None)

QUERIES: list[tuple[int, str]] = [
    (1, "tübingen attractions"),
    (2, "food and drinks"),
    (3, "castle"),
    (4, "zzzqqqxyzzy"),                      # absent from corpus
    (5, "the and of"),                       # all stopwords
    (6, "museum festival chocolate market old town river boat tower walk"),  # >=9 words
    (7, "tuebingen"),                        # tuebingen-only special case
    (8, "käsespätzle dinner"),               # umlauts
]


def _sentence(rng: random.Random, tueb: bool) -> str:
    n = rng.randint(4, 12)
    words = [rng.choice(VOCAB) for _ in range(n)]
    if tueb and rng.random() < 0.5:
        words.insert(rng.randrange(len(words)), rng.choice(TUEB_WORDS))
    if rng.random() < 0.1:
        words.append(f"{rng.randint(1, 2000)},{rng.randint(100, 999)}")
    if rng.random() < 0.1:
        words.append(f"{rng.randint(1, 30)}{rng.choice(['st', 'nd', 'rd', 'th'])}")
    if rng.random() < 0.08:
        words.append("www.example-site.de/info.html")
    if rng.random() < 0.08:
        words.append("open-air")
    return " ".join(words)


def _body(rng: random.Random, tueb: bool, n_paras: int) -> str:
    paras = []
    for _ in range(n_paras):
        sents = ". ".join(_sentence(rng, tueb) for _ in range(rng.randint(2, 5)))
        paras.append(f"<p>\n  {sents}.\n</p>")
    if rng.random() < 0.2:
        paras.append("<script>var x = 1; // tracker\n</script>")
    if rng.random() < 0.15:
        paras.append("<style>.hero { color: red }</style>")
    if rng.random() < 0.25:
        paras.append("<!-- navigation comment -->")
    if rng.random() < 0.3:
        paras.append("<div>Fish &amp; Chips &lt;daily&gt;   </div>")
    if rng.random() < 0.2:
        paras.append("<ul><li> first item </li><li>second\nitem</li></ul>")
    return "\n".join(paras)


def make_pages(
    n: int = 200,
    seed: int = 42,
    big_docs: int = 0,
    dup_groups: int = 6,
) -> pa.Table:
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    epoch = datetime.datetime(2024, 6, 1)

    bodies: list[str] = []
    for i in range(n):
        tueb = rng.random() < 0.5
        body = _body(rng, tueb, rng.randint(1, 4))
        bodies.append(body)

    # duplicate bodies on distinct urls (exact-simhash dup groups)
    for g in range(min(dup_groups, n // 4)):
        src = rng.randrange(n)
        dst = rng.randrange(n)
        if src != dst:
            bodies[dst] = bodies[src]

    for i in range(n):
        lang = rng.choice(LANG_CHOICES)
        lang_attr = f' lang="{lang}"' if lang is not None else ""
        has_title = rng.random() < 0.85
        title = (
            f"<title>Page {i} — Tübingen &amp; around</title>" if has_title else ""
        )
        big = i < big_docs
        body = bodies[i]
        if big:
            filler = " ".join(rng.choice(VOCAB) for _ in range(140_000))
            body = body + f"<p>{filler}</p>"
        html = (
            f"<!DOCTYPE html>\n<html{lang_attr}>\n<head>{title}</head>\n"
            f"<body>\n{body}\n</body>\n</html>"
        )
        domain = f"site{i % 37}.example{'--de' if i % 11 == 0 else ''}.com"
        path = rng.choice(
            ["", "/info", "/attractions/old-town", "/food/menu.html",
             f"/page-{i}", "/img/banner.png"][: 5 if i % 19 else 6]
        )
        url = f"https://www.{domain}{path or '/'}"
        if url in urls:
            url = f"https://www.{domain}/u{i}"
        text, page_lang, _site = extract_page(html, url)

        urls.append(url)
        tss.append(epoch + datetime.timedelta(seconds=i * 61))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(page_lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, **kwargs) -> pa.Table:
    import pyarrow.parquet as pq

    table = make_pages(**kwargs)
    pq.write_table(table, path)
    return table
