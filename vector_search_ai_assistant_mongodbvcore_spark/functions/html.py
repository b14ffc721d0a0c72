"""HTML -> training text extraction, stdlib-only (html.parser).

The step between a WARC response body (sources/warc.py) and the
documents table: strip markup, drop the non-content element classes
(script/style/noscript/template/head-metadata, comments), keep block
structure as newlines so paragraph-level dedup and the Gopher line
heuristics still see lines, and collapse intra-line whitespace. This is
the boilerplate-light tier of extraction — a trafilatura-class
main-content model is an optional swap-in, but the stdlib extractor is
deterministic, dependency-free, and sufficient for the quality gates
downstream (which are the real junk filter in this pipeline).

Charset: bytes are decoded from the Content-Type charset when present,
else UTF-8 with replacement — a wrong legacy charset must yield
replacement characters (which the quality gates then score), never an
executor crash.

Spark shape: `extract_text_udf` is an Arrow-batched pandas UDF; the
per-row work is a linear single-pass parse. No ANSI-SQL twin exists
(a stateful HTML parser is not SQL) — correctness is pinned by
fixture tests in tests/test_warc_html.py.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["html_to_text", "decode_http_text", "extract_text_udf"]

_SKIP = {"script", "style", "noscript", "template", "svg", "iframe"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "h1", "h2", "h3",
    "h4", "h5", "h6", "section", "article", "header", "footer", "blockquote",
    "pre", "td", "th",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: "list[str]" = []
        self.title = ""
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title += data
        if not self._skip_depth:
            self._parts.append(data)

    def text(self) -> str:
        raw = "".join(self._parts)
        lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in raw.split("\n")]
        return "\n".join(ln for ln in lines if ln)


def html_to_text(html: str) -> "tuple[str, str]":
    """(text, title): markup stripped, skip-elements dropped, block tags
    as line breaks, blank lines removed. Tolerant of broken markup —
    html.parser never raises on malformed input."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.text(), re.sub(r"\s+", " ", p.title).strip()


_CHARSET_RE = re.compile(r"charset=([\w\-:.]+)", re.IGNORECASE)


def decode_http_text(body: bytes, content_type: "str | None") -> str:
    """Response bytes -> str using the Content-Type charset when it names
    one Python knows, else UTF-8; undecodable bytes become U+FFFD (the
    quality gates downstream judge the result, the decode never dies)."""
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            enc = m.group(1).strip("\"'").lower()
    try:
        return (body or b"").decode(enc, errors="replace")
    except LookupError:
        return (body or b"").decode("utf-8", errors="replace")


def extract_text_udf():
    """Arrow-batched (body binary, http_content_type string) ->
    struct<text string, title string> — the one hop from read_warc
    response rows to corpus documents."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("text string, title string")
    def _extract(body, ctype):
        texts, titles = [], []
        for b, ct in zip(body, ctype):
            t, title = html_to_text(
                decode_http_text(b if b is not None else b"", ct)
            )
            texts.append(t)
            titles.append(title)
        return pd.DataFrame({"text": texts, "title": titles})

    return _extract
