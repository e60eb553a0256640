"""WARC (ISO 28500 / WARC-1.0) ingestion — the on-disk format Common
Crawl actually ships — as a Ray Data source, plus a writer for tests.

Real CC archives are ~1 GB ``.warc.gz`` files, each a concatenation of
PER-RECORD gzip members (so a reader can skip to any record); a crawl
is ~64k such files.  The Ray-native ingestion unit is therefore the
FILE: ``ray.data.read_binary_files`` hands each archive to one task,
which parses records and emits the ``(url, warc_ts, html)`` page table
— exactly the input_hint schema the quality-filter pipeline consumes.
64k files ≫ cluster cores, so file-level parallelism saturates any
cluster without sub-file splitting (the same layout CC processing
systems standardize on).

Parsing is from the public spec: records are
``WARC/1.0 CRLF headers CRLF CRLF body(Content-Length) CRLF CRLF``;
``response`` records carry an HTTP message whose body follows the
first empty line.  Writer emits per-record gzip members when the path
ends in ``.gz`` (the CC layout) or a plain concatenation otherwise.
"""

from __future__ import annotations

import gzip
import io
import typing

import numpy as np
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data

_CRLF = b"\r\n"


def _warc_timestamp(ts) -> str:
    """numpy datetime64/py datetime → WARC-Date (ISO-8601 Z)."""
    s = np.datetime_as_string(np.datetime64(ts, "s"), timezone="UTC")
    return str(s)


def build_record(url: str, ts, html: bytes,
                 record_id: str = "") -> bytes:
    """One WARC ``response`` record wrapping an HTTP 200 response."""
    http_head = (b"HTTP/1.1 200 OK" + _CRLF +
                 b"Content-Type: text/html; charset=utf-8" + _CRLF +
                 b"Content-Length: " + str(len(html)).encode() + _CRLF +
                 _CRLF)
    payload = http_head + html
    head = (b"WARC/1.0" + _CRLF +
            b"WARC-Type: response" + _CRLF +
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"WARC-Date: " + _warc_timestamp(ts).encode() + _CRLF +
            (b"WARC-Record-ID: <" + record_id.encode() + b">" + _CRLF
             if record_id else b"") +
            b"Content-Type: application/http; msgtype=response" + _CRLF +
            b"Content-Length: " + str(len(payload)).encode() + _CRLF +
            _CRLF)
    return head + payload + _CRLF + _CRLF


def write_warc(path: str, pages: typing.Iterable[dict]) -> int:
    """Write ``pages`` (dicts with url/warc_ts/html) to one WARC file;
    ``.gz`` suffix → per-record gzip members (the CC layout).  Returns
    the record count."""
    gz = path.endswith(".gz")
    n = 0
    with open(path, "wb") as f:
        for p in pages:
            rec = build_record(p["url"], p["warc_ts"], p["html"])
            f.write(gzip.compress(rec) if gz else rec)
            n += 1
    return n


def parse_warc(data: bytes) -> typing.Iterator[dict]:
    """Yield (url, warc_ts, html) from one WARC archive's bytes.
    Handles multi-member gzip transparently; skips non-response
    records."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
            data = g.read()
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", errors="replace")
        headers = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        body = data[head_end + 4: head_end + 4 + length]
        pos = head_end + 4 + length
        while data[pos:pos + 2] == _CRLF:  # record separator
            pos += 2
        if headers.get("warc-type") != "response":
            continue
        http_end = body.find(_CRLF + _CRLF)
        html = body[http_end + 4:] if http_end >= 0 else body
        ts = headers.get("warc-date", "1970-01-01T00:00:00Z").rstrip("Z")
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": np.datetime64(ts, "us"),
            "html": html,
        }


def read_warc(paths, *, override_num_blocks: int = 0) -> "ray.data.Dataset":
    """``Dataset[(url, warc_ts, html)]`` from WARC file(s) — one parse
    task per archive file (the CC-standard parallelism unit)."""
    import ray.data

    files = ray.data.read_binary_files(
        paths,
        override_num_blocks=override_num_blocks or None)

    def parse_batch(batch: pa.Table) -> pa.Table:
        urls: list = []
        tss: list = []
        htmls: list = []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, dtype="datetime64[us]")
                if tss else np.empty(0, dtype="datetime64[us]")),
            "html": pa.array(htmls, type=pa.binary()),
        })

    return files.map_batches(parse_batch, batch_format="pyarrow")
