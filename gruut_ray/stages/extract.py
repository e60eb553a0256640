"""HTML → text extraction stage (stateless map_batches fn).

Byte-exact inverse of ``gruut_ray.sources.synth.build_html`` — the per-row
invariant from BASELINE.json: ``extract_text(html) == text`` for every url.
General enough for simple real pages: takes <main> (or <body>), drops
nav/footer/script/style blocks, joins <p> blocks with blank lines, unescapes
entities.
"""

from __future__ import annotations

import html as html_mod
import re
import typing

import pyarrow as pa

_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.DOTALL)
_DROP_RE = re.compile(
    rb"<(nav|footer|script|style|header|aside)\b.*?</\1>", re.DOTALL)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text(html: bytes) -> str:
    m = _MAIN_RE.search(html)
    if m is None:
        body = _BODY_RE.search(html)
        m = body
    content = m.group(1) if m is not None else html
    content = _DROP_RE.sub(b"", content)
    paragraphs = _P_RE.findall(content)
    if not paragraphs:
        paragraphs = [_TAG_RE.sub(b"", content)]
    parts = [html_mod.unescape(p.decode("utf-8", errors="replace"))
             for p in paragraphs]
    return "\n\n".join(parts)


def extract_batch(batch: pa.Table,
                  html_col: str = "html",
                  out_col: str = "text",
                  drop_html: bool = True) -> pa.Table:
    """map_batches(pyarrow) kernel.  Drops the (wide) html column right after
    extraction so downstream stages never ship it (SURVEY §7 hard part 6)."""
    htmls = batch.column(html_col).to_pylist()
    texts = pa.array([extract_text(h) for h in htmls], type=pa.large_string())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    batch = batch.append_column(out_col, texts)
    if drop_html:
        batch = batch.drop_columns([html_col])
    return batch


_HREF_RE = re.compile(rb"<a\s[^>]*href=\"([^\"]+)\"", re.IGNORECASE)


def extract_links(html: bytes) -> typing.List[str]:
    """Absolute http(s) hrefs from anywhere in the page (nav included —
    the link graph wants exactly the boilerplate links extract_text
    drops)."""
    out = []
    for m in _HREF_RE.findall(html):
        u = html_mod.unescape(m.decode("utf-8", errors="replace"))
        if u.startswith("http://") or u.startswith("https://"):
            out.append(u)
    return out
