"""HTML -> text extraction — the per-row byte-identity invariant.

The reference extracts page text as::

    ' '.join(BeautifulSoup(html, 'html.parser').stripped_strings).replace('\\n', ' ')

(/root/reference/WebCrawler_basis.py:221-222), takes ``lang`` from the
``<html lang>`` attribute with default ``'en'``
(/root/reference/WebCrawler_basis.py:225-227), and the site name from
``soup.title.string`` falling back to the domain without ``www.``
(/root/reference/WebCrawler_basis.py:229-238).

BeautifulSoup is not available in this environment, so this module
reimplements those semantics on top of the stdlib ``html.parser``
(which is exactly the backend BeautifulSoup's ``'html.parser'`` tree
builder wraps):

- text segments are maximal runs of character data between tag /
  comment / declaration events (bs4 coalesces consecutive data into one
  ``NavigableString`` per run), ``str.strip()``-ed, empty runs dropped;
- character references are converted (``convert_charrefs=True``, the
  bs4 default), except inside script/style CDATA content — matching
  the stdlib/bs4 behavior;
- ``<script>``/``<style>`` text IS included (bs4 ``stripped_strings``
  yields it with the html.parser builder — pinned by FIXTURES.md §1);
- comments, doctype declarations and processing instructions are
  excluded.

The fixture generator and the distributed extract stage both call
:func:`extract_page`, and unit tests pin the tricky cases with
hand-written expected strings.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urlparse


class _PageParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._buf: list[str] = []
        self.strings: list[str] = []
        self.lang: str | None = None
        self._html_seen = False
        self._in_title = False
        self._title_done = False
        self._title_buf: list[str] = []

    # -- data-run coalescing (bs4's endData) ------------------------------
    def _flush(self) -> None:
        if not self._buf:
            return
        run = "".join(self._buf)
        self._buf.clear()
        stripped = run.strip()
        if stripped:
            self.strings.append(stripped)

    def handle_data(self, data: str) -> None:
        self._buf.append(data)
        if self._in_title:
            self._title_buf.append(data)

    # -- tag events -------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag == "html" and not self._html_seen:
            self._html_seen = True
            for name, value in attrs:
                if name == "lang":
                    self.lang = value if value is not None else ""
                    break
        if tag == "title" and not self._title_done:
            self._in_title = True

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    # comments / declarations / PIs break data runs but emit no text
    def handle_comment(self, data: str) -> None:
        self._flush()

    def handle_decl(self, decl: str) -> None:
        self._flush()

    def handle_pi(self, data: str) -> None:
        self._flush()

    def unknown_decl(self, data: str) -> None:
        self._flush()

    def close(self) -> None:
        super().close()
        self._flush()


def _decode(html: bytes | str) -> str:
    if isinstance(html, bytes):
        return html.decode("utf-8", errors="replace")
    return html


def extract_page(html: bytes | str, url: str = "") -> tuple[str, str, str]:
    """Parse once; return ``(text, lang, site_name)``.

    - text: the reference's stripped-strings join with ``'\\n'``→``' '``;
    - lang: ``<html lang>`` value, ``'en'`` when absent
      (WebCrawler_basis.py:225-227);
    - site_name: title string, else domain without ``www.``
      (WebCrawler_basis.py:229-238).
    """
    parser = _PageParser()
    parser.feed(_decode(html))
    parser.close()

    text = " ".join(parser.strings).replace("\n", " ")
    lang = parser.lang if parser.lang is not None else "en"

    title = "".join(parser._title_buf)
    if parser._title_done and title:
        site = title
    else:
        domain = urlparse(url).netloc
        if domain.startswith("www."):
            domain = domain[4:]
        site = domain
    return text, lang, site


def extract_text(html: bytes | str) -> str:
    return extract_page(html)[0]
