"""Text analysis operators over a documents table (training-data ops):
token counting (whitespace + BPE-ish regex), quality-score columns,
language distribution, document fingerprints, top-k reports.

All are thin, vectorized Dataset compositions registered in
``__ray_entry__.queries()`` with DuckDB oracles where SQL can express them.
"""

from __future__ import annotations

import re
import typing
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if typing.TYPE_CHECKING:
    import ray.data

# GPT-2-style pretokenizer regex (public knowledge), minus lookahead quirks
BPE_ISH = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+", re.UNICODE)

_WS = re.compile(r"\s+")


def token_counts_batch(batch: pa.Table, text_col: str = "text",
                       include_bpe: bool = True) -> pa.Table:
    """Adds n_ws_tokens (whitespace split) and, with ``include_bpe``,
    n_bpe_tokens (regex pretokenizer).  The BPE pass is a per-row Python
    findall and dominates the cost — callers that only need whitespace
    counts should pass ``include_bpe=False`` to stay fully vectorized."""
    texts = batch.column(text_col)
    # whitespace tokens: count via arrow split_pattern_regex (vectorized)
    ws_counts = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+"))
    # empty strings produce [""] -> count 1; fix to 0
    empty = pc.equal(pc.utf8_trim_whitespace(texts), "")
    ws_counts = pc.if_else(empty, pa.scalar(0, pa.int32()), ws_counts)
    batch = batch.append_column("n_ws_tokens",
                                pc.cast(ws_counts, pa.int64()))
    if include_bpe:
        bpe_counts = pa.array(
            [len(BPE_ISH.findall(t)) if t else 0
             for t in texts.to_pylist()],
            type=pa.int64())
        batch = batch.append_column("n_bpe_tokens", bpe_counts)
    return batch


def tokens_by_lang(ds: "ray.data.Dataset", text_col: str = "text",
                   lang_col: str = "lang"):
    """Total docs/tokens/chars per language, via per-batch partial
    aggregation then a tiny driver-side merge (documents never shuffle)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        batch = token_counts_batch(batch, text_col, include_bpe=False)
        tbl = pa.table({
            "lang": batch.column(lang_col),
            "n_ws_tokens": batch.column("n_ws_tokens"),
            "n_chars": pc.cast(pc.utf8_length(batch.column(text_col)),
                               pa.int64()),
        })
        df = tbl.to_pandas()
        agg = df.groupby("lang", as_index=False).agg(
            n_docs=("n_ws_tokens", "size"),
            n_tokens=("n_ws_tokens", "sum"),
            n_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    return partial_then_merge(ds, partials, ["lang"],
                              {"n_docs": "sum", "n_tokens": "sum",
                               "n_chars": "sum"})


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """128-bit blake2b document fingerprint (content identity that is
    whitespace-normalization-invariant; crc32's 2^32 space collides at
    ~77k unique docs and would undercount vs a distinct-text oracle)."""
    import hashlib

    texts = batch.column(text_col).to_pylist()
    fps = []
    for t in texts:
        norm = _WS.sub(" ", (t or "").strip())
        fps.append(hashlib.blake2b(norm.encode(),
                                   digest_size=16).hexdigest())
    return batch.append_column("fingerprint",
                               pa.array(fps, type=pa.string()))


def winnow_fingerprints(text: str, k: int = 5, window: int = 4,
                        ) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every char k-gram, then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive k-gram hashes
    (rightmost minimum on ties) — the selected hashes are a position-
    robust sketch: any shared substring of length ≥ k+window-1 between
    two documents is guaranteed to share a fingerprint.  Vectorized:
    the k-gram hash reuses :func:`_shingle-style` byte windows and the
    window minimum is a strided ``np.min``."""
    from gruut_ray.pipelines.dedup import _shingle_hashes

    if not text:
        return np.array([], dtype=np.uint64)  # no content, no fingerprints
    hashes = _shingle_hashes(text, k)
    n = len(hashes)
    if n <= window:
        return np.array([hashes.min()], dtype=np.uint64)
    wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
    # rightmost minimum per window: argmin on the reversed axis
    rev_arg = wins[:, ::-1].argmin(axis=1)
    pos = np.arange(len(wins)) + (window - 1 - rev_arg)
    # dedupe consecutive selections of the same global position
    keep = np.ones(len(pos), dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    return hashes[pos[keep]]


def winnow_sketches(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5, window: int = 4,
                    ) -> "ray.data.Dataset":
    """Per-document winnowing sketch column (list<uint64>) + sketch size —
    the substring-matching-capable fingerprint family (near-dup detection
    on partial overlap, plagiarism-style matching) that complements the
    whole-document blake2b fingerprint and SimHash."""
    def add(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sketches = [winnow_fingerprints(t, k, window) for t in texts]
        batch = batch.append_column(
            "sketch", pa.array([s.tolist() for s in sketches],
                               type=pa.list_(pa.uint64())))
        return batch.append_column(
            "sketch_size", pa.array([len(s) for s in sketches],
                                    type=pa.int64()))
    return ds.map_batches(add, batch_format="pyarrow")


def top_k_longest(ds: "ray.data.Dataset", k: int = 10,
                  id_col: str = "doc_id", text_col: str = "text",
                  ) -> "ray.data.Dataset":
    """Top-k docs by char length (sort is the shuffle; k rows come back)."""
    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": pc.cast(pc.utf8_length(batch.column(text_col)),
                               pa.int64()),
        })

    return ds.map_batches(lengths, batch_format="pyarrow").sort(
        ["n_chars", id_col], descending=[True, False]).limit(k)


def top_terms_by_lang(ds: "ray.data.Dataset", k: int = 5,
                      text_col: str = "text", lang_col: str = "lang"):
    """Top-k most frequent whitespace terms per language.

    Scale shape: per-batch Counter partials (the hot keys — "the", "de",
    "la" — are combined inside every batch BEFORE any exchange, so the
    groupby shuffles at most (num_blocks × batch_vocab) count rows, never
    token rows, and key skew is bounded by block count); distributed
    ``groupby(lang, term)`` sum; per-lang top-k via ``map_groups`` over the
    tiny per-lang count tables.  Ties break by term ascending (same rule as
    the SQL oracle's row_number ordering).
    """
    import collections

    import pandas as pd
    import pyarrow as pa

    def partial_counts(batch: pa.Table) -> pa.Table:
        langs_col = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        counts: dict = {}
        for lang, text in zip(langs_col, texts):
            c = counts.setdefault(lang, collections.Counter())
            c.update(t.lower() for t in (text or "").split())
        rows_lang, rows_term, rows_n = [], [], []
        for lang, c in counts.items():
            for term, n in c.items():
                rows_lang.append(lang)
                rows_term.append(term)
                rows_n.append(n)
        return pa.table({
            "lang": pa.array(rows_lang, type=pa.string()),
            "term": pa.array(rows_term, type=pa.string()),
            "n": pa.array(rows_n, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby(["lang", "term"])
              .aggregate(Sum("n", alias_name="n")))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["n", "term"], ascending=[False, True])
                .head(k))

    out = counts.groupby("lang").map_groups(topk, batch_format="pandas")
    return (out.to_pandas()
            .sort_values(["lang", "n", "term"], ascending=[True, False, True])
            .reset_index(drop=True))


def repetition_stats_batch(batch: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text") -> pa.Table:
    """Per-document word-repetition signals (Gopher/C4-style quality
    rules, Rae et al. 2021 §A1.1): total words, distinct words, and the
    hottest word's count.  Downstream filters derive the duplicate-word
    fraction ``1 - n_distinct/n_words`` and top-word fraction
    ``max_word_count/n_words``; the raw columns stay integers so the
    DuckDB oracle compare is exact.

    Per-row pure (documents never shuffle): arrow regex split, one pandas
    explode + two groupbys per batch.  Splitting matches the oracle's
    ``regexp_split_to_array(trim(text), '\\s+')`` exactly (both RE2);
    an all-whitespace doc yields the [""] singleton on both sides."""
    words = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch.column(text_col)), r"\s+")
    tbl = pa.table({id_col: batch.column(id_col), "w": words})
    df = tbl.to_pandas().explode("w")
    wc = df.groupby([id_col, "w"], as_index=False, sort=False).size()
    agg = wc.groupby(id_col, as_index=False, sort=False).agg(
        n_words=("size", "sum"),
        n_distinct_words=("size", "size"),
        max_word_count=("size", "max"))
    for c in ("n_words", "n_distinct_words", "max_word_count"):
        agg[c] = agg[c].astype("int64")
    return pa.Table.from_pandas(
        agg, preserve_index=False).replace_schema_metadata(None)


def doc_repetition_stats(ds: "ray.data.Dataset", id_col: str = "doc_id",
                         text_col: str = "text") -> "ray.data.Dataset":
    """Lazy per-doc repetition-stats Dataset (see
    :func:`repetition_stats_batch`)."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, id_col=id_col,
                                         text_col=text_col),
        batch_format="pyarrow")
