"""Deterministic synthetic Common-Crawl-style page table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:large_string,
    lang:string

Invariants:
* fully deterministic in (seed, row index) — independent of batch size,
  partitioning, or worker count (counter-based splitmix64 hashing, no RNG
  state), so any shard can be (re)generated independently at any scale;
* ``extract_text(html) == text`` byte-identically for every row (the
  per-row invariant the driver checks);
* language mix skewed toward English (mirrors CC);
* a controlled fraction of junk documents (too short / symbol spam /
  repetition / PII-laden) so the quality filter has real work.
"""

from __future__ import annotations

import datetime
import html as html_mod
import typing

import numpy as np

from gruut_ray.profiles import get_profile
from gruut_ray.quality.vocab import words_for_lang

SEED = 0x5EED_CC
LANGS = ("en-us", "de-de", "fr-fr", "es-es", "ru-ru", "zh-cn")
_LANG_WEIGHTS = (0.40, 0.12, 0.12, 0.12, 0.12, 0.12)
_LANG_CDF = np.cumsum(_LANG_WEIGHTS)


_BASE_TS = datetime.datetime(2024, 1, 1)

_M64 = (1 << 64) - 1


def _h(i: int, stream: int, seed: int = SEED) -> int:
    """Deterministic splitmix64 hash of (seed, row, stream) — counter-based,
    so generation is independent of batching/ordering."""
    x = (seed ^ (i * 0x9E3779B97F4A7C15) ^ (stream * 0xC2B2AE3D27D4EB4F)) & _M64
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def _uniform(i: int, stream: int) -> float:
    return _h(i, stream) / 2 ** 64


_VOCABS: typing.Dict[str, typing.List[str]] = {}


def _vocab(lang: str) -> typing.List[str]:
    v = _VOCABS.get(lang)
    if v is None:
        v = words_for_lang(lang)
        _VOCABS[lang] = v
    return v


def _make_sentence(i: int, lang: str, sent_idx: int, n_words: int,
                   seed: int = SEED) -> str:
    vocab = _vocab(lang)
    V = len(vocab)
    chars = get_profile(lang).split_mode == "chars"
    words = [vocab[_h(i, 1000 + sent_idx * 64 + k, seed) % V]
             for k in range(n_words)]
    # sprinkle numbers / currency / dates for normalizer work
    extra = _h(i, 2000 + sent_idx, seed) % 100
    if extra < 8:
        words.append(str(_h(i, 2001 + sent_idx, seed) % 5000))
    elif extra < 12 and not chars:
        words.append(f"${(_h(i, 2002 + sent_idx, seed) % 900) + 1}.{_h(i, 2003 + sent_idx, seed) % 100:02d}")
    elif extra < 15 and lang == "en-us":
        m = (_h(i, 2004 + sent_idx, seed) % 12) + 1
        d = (_h(i, 2005 + sent_idx, seed) % 28) + 1
        y = 1950 + _h(i, 2006 + sent_idx, seed) % 70
        words.append(f"{m}/{d}/{y}")
    if chars:
        return "".join(words) + "。"
    words[0] = words[0][:1].upper() + words[0][1:]
    end = "." if _h(i, 2100 + sent_idx, seed) % 10 < 8 else ("?" if _h(i, 2100 + sent_idx, seed) % 2 else "!")
    return " ".join(words) + end


def make_text(i: int, lang: str, seed: int = SEED) -> str:
    """Document body for global row ``i``."""
    doc_kind = _h(i, 10, seed) / 2 ** 64
    if doc_kind < 0.04:
        # too short
        return _make_sentence(i, lang, 0, 2 + _h(i, 11, seed) % 3, seed)[:40]
    if doc_kind < 0.07:
        # symbol spam
        n = 20 + _h(i, 12, seed) % 30
        syms = "#$%&*@!^~=+"
        return " ".join(
            syms[_h(i, 13 + k, seed) % len(syms)]
            * (1 + _h(i, 40 + k, seed) % 3)
            for k in range(n))
    if doc_kind < 0.10:
        # heavy repetition
        vocab = _vocab(lang)
        w = vocab[_h(i, 14, seed) % len(vocab)]
        sep = "" if get_profile(lang).split_mode == "chars" else " "
        return sep.join([w] * (60 + _h(i, 15, seed) % 60))

    n_sents = 3 + _h(i, 16, seed) % 8
    sents = [_make_sentence(i, lang, s, 6 + _h(i, 17 + s, seed) % 12, seed)
             for s in range(n_sents)]
    # paragraph break in the middle sometimes
    if n_sents >= 4 and _h(i, 18, seed) % 3 == 0:
        mid = n_sents // 2
        text = " ".join(sents[:mid]) + "\n\n" + " ".join(sents[mid:])
    else:
        text = " ".join(sents)
    if doc_kind >= 0.96:
        # inject PII (kept docs, but scrubbed)
        user = f"user{_h(i, 19, seed) % 10000}"
        text += f" Contact {user}@example.com or +1 555-{_h(i, 20, seed) % 900 + 100}-{_h(i, 21, seed) % 9000 + 1000}."
    return text


def lang_for_row(i: int, seed: int = SEED) -> str:
    u = _h(i, 1, seed) / 2 ** 64
    return LANGS[int(np.searchsorted(_LANG_CDF, u))]


BOILERPLATE_NAV = "<nav><a href=\"/\">Home</a><a href=\"/about\">About</a></nav>"
BOILERPLATE_FOOTER = "<footer>© 2024 Example Site</footer>"


def build_html(text: str, title: str,
               links: typing.Sequence[str] = ()) -> bytes:
    """Deterministic HTML wrapper; ``extract_text`` inverts it exactly.
    ``links`` render as nav anchors OUTSIDE <main>, so the extracted
    text is unaffected (extract_links reads them, extract_text never
    sees them)."""
    paragraphs = text.split("\n\n")
    body = "".join(f"<p>{html_mod.escape(par)}</p>" for par in paragraphs)
    nav_links = "".join(f"<a href=\"{html_mod.escape(u)}\">ref</a>"
                        for u in links)
    doc = (
        "<html><head><meta charset=\"utf-8\"/><title>"
        + html_mod.escape(title)
        + "</title></head><body>"
        + BOILERPLATE_NAV
        + (f"<nav class=\"refs\">{nav_links}</nav>" if nav_links else "")
        + "<main>" + body + "</main>"
        + BOILERPLATE_FOOTER
        + "</body></html>"
    )
    return doc.encode("utf-8")


def make_batch_for_ids(ids: typing.Sequence[int],
                       seed: int = SEED) -> typing.Dict[str, np.ndarray]:
    """Generate the rows with the given global ids as a dict of numpy arrays
    (map_batches-friendly).  Batch-size invariant by construction."""
    count = len(ids)
    urls = np.empty(count, dtype=object)
    ts = np.empty(count, dtype="datetime64[us]")
    htmls = np.empty(count, dtype=object)
    texts = np.empty(count, dtype=object)
    langs = np.empty(count, dtype=object)
    from gruut_ray.profiles import short_lang

    for k in range(count):
        i = int(ids[k])
        lang = lang_for_row(i, seed)
        short = short_lang(lang)
        text = make_text(i, lang, seed)
        site = _h(i, 2, seed) % 1000
        urls[k] = f"https://site{site}.example/{short}/{i:010d}"
        ts[k] = np.datetime64(_BASE_TS, "us") + np.timedelta64(
            _h(i, 3, seed) % (365 * 24 * 3600), "s")
        # deterministic cross-host outlinks with a quadratic popularity
        # skew (low site numbers collect most inlinks) — gives the link
        # graph a non-uniform PageRank to measure
        links = []
        for j in range(3):
            t = _h(i, 50 + j, seed) % 1000
            target = (t * t) // 1000
            if target != site:
                links.append(f"https://site{target}.example/")
        htmls[k] = build_html(text, title=f"Page {i}", links=links)
        texts[k] = text
        langs[k] = short
    return {"url": urls, "warc_ts": ts, "html": htmls, "text": texts,
            "lang": langs}


def synth_dataset(n_rows: int, seed: int = SEED, *, parallelism: int = 0):
    """``ray.data.Dataset`` of n_rows synthetic CC pages.  Generation happens
    inside map_batches tasks (distributed), not on the driver."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=parallelism or None)

    def gen(batch: typing.Dict[str, np.ndarray]) -> pa.Table:
        ids = batch["id"]
        if len(ids) == 0:
            return pa.table({})
        out = make_batch_for_ids(ids, seed)
        return pa.table({
            "url": pa.array(out["url"], type=pa.string()),
            "warc_ts": pa.array(out["warc_ts"]),
            "html": pa.array(list(out["html"]), type=pa.binary()),
            "text": pa.array(list(out["text"]), type=pa.large_string()),
            "lang": pa.array(out["lang"], type=pa.string()),
        })

    return ds.map_batches(gen, batch_format="numpy", batch_size=2048)
