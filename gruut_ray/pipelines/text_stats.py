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


# Gopher's fixed stop-word list (Rae et al. 2021 §A1.1: "contains at
# least two of the following English words") — the membership-count
# signal its document filter derives from.
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


def quality_signals_batch(batch: pa.Table, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Per-document line/word shape signals behind C4/Gopher-style
    cleaning rules (Raffel et al. 2020 §2.2; Rae et al. 2021 §A1.1):
    line counts, bullet-/ellipsis-line counts, alphabetic-word and
    stop-word counts, digit chars.  All columns are integers so the
    DuckDB oracle compare is exact; downstream filters derive the
    fractions (e.g. drop if bullet_lines/lines > 0.9).

    Fully vectorized per batch — arrow list split + ``list_flatten`` /
    ``list_parent_indices`` + one ``np.bincount`` segment-sum per
    signal; no Python loop, no pandas explode.  Regexes are RE2 on both
    engine (arrow) and oracle (DuckDB) sides."""
    texts = pc.fill_null(batch.column(text_col), "").combine_chunks()
    n = len(texts)

    def seg_count(parents: np.ndarray, mask) -> pa.Array:
        w = mask.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.array(
            np.bincount(parents, weights=w, minlength=n).astype(np.int64))

    lines = pc.split_pattern(texts, "\n")
    lflat = pc.list_flatten(lines)
    lpar = pc.list_parent_indices(lines).to_numpy()
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
    wflat = pc.list_flatten(words)
    wpar = pc.list_parent_indices(words).to_numpy()

    return pa.table({
        id_col: batch.column(id_col),
        "n_lines": pc.cast(pc.list_value_length(lines), pa.int64()),
        "n_bullet_lines": seg_count(
            lpar, pc.match_substring_regex(lflat, r"^\s*[-*•]")),
        "n_ellipsis_lines": seg_count(
            lpar, pc.match_substring_regex(lflat, r"(\.\.\.|…)\s*$")),
        "n_alpha_words": seg_count(
            wpar, pc.match_substring_regex(wflat, r"[A-Za-z]")),
        "n_stop_words": seg_count(
            wpar, pc.is_in(pc.utf8_lower(wflat),
                           value_set=pa.array(_GOPHER_STOPWORDS))),
        "n_digit_chars": pc.cast(
            pc.count_substring_regex(texts, r"[0-9]"), pa.int64()),
    })


def doc_quality_signals(ds: "ray.data.Dataset", id_col: str = "doc_id",
                        text_col: str = "text") -> "ray.data.Dataset":
    """Lazy per-doc quality-signal Dataset (see
    :func:`quality_signals_batch`)."""
    return ds.map_batches(
        lambda b: quality_signals_batch(b, id_col=id_col,
                                        text_col=text_col),
        batch_format="pyarrow")


def longest_doc_per_lang(ds: "ray.data.Dataset", lang_col: str = "lang",
                         id_col: str = "doc_id",
                         len_col: str = "n_chars"):
    """Distributed argmax per group with a deterministic tie-break
    (greatest ``len_col``, then smallest ``id_col``) — the grouped-top-1
    window pattern (SQL ``row_number() OVER (PARTITION BY ...)``) without
    shuffling data rows: every batch emits at most one candidate row per
    group, the driver re-runs the same pick on the (blocks × groups)
    candidates.  For group cardinalities that outgrow the driver, swap
    the final pick for a Ray ``groupby(lang).map_groups`` over the same
    candidate stream — the per-batch reduction already bounds the
    exchange."""
    import pandas as pd  # noqa: F401  (driver-side merge)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([lang_col, id_col, len_col]).to_pandas()
        df = df.sort_values([len_col, id_col], ascending=[False, True])
        return pa.Table.from_pandas(
            df.groupby(lang_col, as_index=False, sort=False).head(1),
            preserve_index=False).replace_schema_metadata(None)

    cands = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    out = (cands.sort_values([len_col, id_col], ascending=[False, True])
           .groupby(lang_col, as_index=False, sort=False).head(1))
    return (out[[lang_col, id_col, len_col]]
            .sort_values(lang_col).reset_index(drop=True))


def length_quantiles_by_lang(ds: "ray.data.Dataset",
                             qs=(0.25, 0.5, 0.75, 0.9),
                             lang_col: str = "lang",
                             val_col: str = "n_chars"):
    """EXACT grouped quantiles of an integer column via a distributed
    value histogram — the scale path for exact (not sketched) quantiles
    when the value domain is bounded (char/token lengths, scores in
    fixed precision): per-batch ``(group, value) → count`` partials
    combine before any exchange, so only histogram rows ever move, and
    the driver reduces a (groups × distinct-values) table, never data
    rows.  For unbounded/continuous domains, quantize to fixed-precision
    buckets first or use a mergeable sketch instead.

    Quantile convention matches SQL ``quantile_disc``: the value at
    0-based rank ``ceil(q·n) − 1`` of the sorted column.  ``q·n`` is
    computed in exact rational arithmetic — float ``ceil(0.9 * 10)``
    is 10, not 9, and silently shifts the rank."""
    import math
    from fractions import Fraction

    import pandas as pd

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select([lang_col, val_col])
                .group_by([lang_col, val_col])
                .aggregate([(val_col, "count")])
                .rename_columns([lang_col, val_col, "n"]))

    hist = partial_then_merge(ds, partial, [lang_col, val_col],
                              {"n": "sum"})
    rows = []
    for lang, g in hist.groupby(lang_col, dropna=False):
        g = g.sort_values(val_col)
        counts = g["n"].to_numpy(dtype=np.int64)
        vals = g[val_col].to_numpy()
        cum = counts.cumsum()
        n_total = int(cum[-1])
        row = {"lang": lang, "n_docs": n_total}
        for q in qs:
            rank = max(math.ceil(Fraction(str(q)) * n_total) - 1, 0)
            idx = int(np.searchsorted(cum, rank + 1))
            row[f"p{round(q * 100):02d}"] = int(vals[idx])
        rows.append(row)
    return (pd.DataFrame(rows).sort_values("lang")
            .reset_index(drop=True))


def stratified_sample(ds: "ray.data.Dataset", n_per_group: int,
                      group_col: str = "lang", id_col: str = "doc_id"):
    """Deterministic stratified sample: the ``n_per_group`` rows with the
    smallest ``md5(str(id))`` per group (ties by id) — the train/val
    split primitive that is reproducible across runs, partitionings and
    engines (the same rule is one SQL window expression, so the split is
    auditable by any warehouse).

    Scale shape: grouped-top-N by the argmax-candidate pattern — every
    batch emits at most ``n_per_group`` candidate rows per group, the
    driver re-applies the same selection to (blocks × groups × n)
    candidate rows; data rows never shuffle.  The hash makes the sample
    uniform regardless of id assignment order."""
    import hashlib

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, id_col]).to_pandas()
        df["_h"] = [hashlib.md5(str(i).encode()).hexdigest()
                    for i in df[id_col]]
        df = df.sort_values(["_h", id_col])
        return pa.Table.from_pandas(
            df.groupby(group_col, as_index=False, sort=False)
            .head(n_per_group),
            preserve_index=False).replace_schema_metadata(None)

    cands = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (cands.sort_values(["_h", id_col])
           .groupby(group_col, as_index=False, sort=False)
           .head(n_per_group)
           .drop(columns=["_h"]))
    return (out[[group_col, id_col]]
            .sort_values([group_col, id_col]).reset_index(drop=True))


def top_k_docs_per_lang(ds: "ray.data.Dataset", k: int = 3,
                        lang_col: str = "lang", id_col: str = "doc_id",
                        len_col: str = "n_chars"):
    """Grouped top-k window (SQL ``row_number() OVER (PARTITION BY lang
    ORDER BY n_chars DESC, doc_id) <= k``) with the same scale shape as
    :func:`longest_doc_per_lang`: every batch emits at most k candidate
    rows per group (a partial top-k is closed under union), the driver
    re-runs the identical pick over (blocks × groups × k) candidates —
    data rows never shuffle.  Emits a ``rank`` column (1-based within
    the group) to match the SQL window shape."""
    import pandas as pd  # noqa: F401  (driver-side merge)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([lang_col, id_col, len_col]).to_pandas()
        df = df.sort_values([len_col, id_col], ascending=[False, True])
        return pa.Table.from_pandas(
            df.groupby(lang_col, as_index=False, sort=False).head(k),
            preserve_index=False).replace_schema_metadata(None)

    cands = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    out = (cands.sort_values([len_col, id_col], ascending=[False, True])
           .groupby(lang_col, as_index=False, sort=False).head(k)
           .sort_values([lang_col, len_col, id_col],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    out["rank"] = out.groupby(lang_col, sort=False).cumcount() + 1
    return out[[lang_col, "rank", id_col, len_col]]


def lang_source_rollup(ds: "ray.data.Dataset", lang_col: str = "lang",
                       source_col: str = "source",
                       len_col: str = "n_chars"):
    """ROLLUP grouping sets — SQL ``GROUP BY ROLLUP(lang, source)`` —
    computed from ONE distributed aggregation: the finest grouping
    (lang, source) reduces via combiner partials (`partial_then_merge`),
    then the coarser levels (lang) and () are pure driver-side re-sums
    of that already-tiny table, never a second pass over data.  Grouped-
    out key levels surface as ``'ALL'`` (the oracle COALESCEs NULL to
    the same marker so the hash compare is well-defined)."""
    import pandas as pd

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select([lang_col, source_col, len_col])
                .group_by([lang_col, source_col])
                .aggregate([(len_col, "sum"), (len_col, "count")])
                .rename_columns([lang_col, source_col, "sum_chars",
                                 "n_docs"]))

    fine = partial_then_merge(ds, partial, [lang_col, source_col],
                              {"sum_chars": "sum", "n_docs": "sum"})
    mid = (fine.groupby(lang_col, as_index=False)[["sum_chars", "n_docs"]]
           .sum())
    mid[source_col] = "ALL"
    total = pd.DataFrame({
        lang_col: ["ALL"], source_col: ["ALL"],
        "sum_chars": [fine["sum_chars"].sum()],
        "n_docs": [fine["n_docs"].sum()],
    })
    cols = [lang_col, source_col, "sum_chars", "n_docs"]
    out = pd.concat([fine[cols], mid[cols], total[cols]],
                    ignore_index=True)
    out["sum_chars"] = out["sum_chars"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return (out.sort_values([lang_col, source_col])
            .reset_index(drop=True))


def top_bigrams_by_lang(ds: "ray.data.Dataset", k: int = 5,
                        text_col: str = "text", lang_col: str = "lang"):
    """Top-k most frequent adjacent word pairs per language — the seed of
    an n-gram LM / collocation table over a web corpus.

    Same scale shape as :func:`top_terms_by_lang`: per-batch Counter
    partials collapse the hot bigrams inside every block before any
    exchange (the shuffle moves (block × batch-bigram-vocab) count rows,
    never token rows), distributed ``groupby(lang, bigram)`` sum, then
    per-lang top-k over the tiny count tables.  Ties break by bigram
    ascending, matching the SQL oracle's row_number ordering."""
    import collections

    import pandas as pd
    import pyarrow as pa

    def partial_counts(batch: pa.Table) -> pa.Table:
        langs_col = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        counts: dict = {}
        for lang, text in zip(langs_col, texts):
            c = counts.setdefault(lang, collections.Counter())
            toks = (text or "").lower().split()
            c.update(a + " " + b for a, b in zip(toks, toks[1:]))
        rows_lang, rows_bg, rows_n = [], [], []
        for lang, c in counts.items():
            for bg, n in c.items():
                rows_lang.append(lang)
                rows_bg.append(bg)
                rows_n.append(n)
        return pa.table({
            "lang": pa.array(rows_lang, type=pa.string()),
            "bigram": pa.array(rows_bg, type=pa.string()),
            "n": pa.array(rows_n, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby(["lang", "bigram"])
              .aggregate(Sum("n", alias_name="n")))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["n", "bigram"], ascending=[False, True])
                .head(k))

    out = counts.groupby("lang").map_groups(topk, batch_format="pandas")
    return (out.to_pandas()
            .sort_values(["lang", "n", "bigram"],
                         ascending=[True, False, True])
            .reset_index(drop=True))


def distinctive_terms_by_lang(ds: "ray.data.Dataset", k: int = 5,
                              scale: int = 1_000_000,
                              text_col: str = "text",
                              lang_col: str = "lang",
                              num_partitions: int = 8):
    """Top-k most *distinctive* terms per language by a TF-IDF-style
    score computed in exact integer arithmetic —
    ``score = tf(lang,term) * scale // df(term)`` (floor division, both
    engines) — so the SQL oracle compares bit-for-bit with no float
    log/idf in between.

    Scale shape: ONE scan emits per-batch partials carrying both stats
    (term occurrences ``n`` and containing-doc counts ``ndocs`` — a doc
    lives in exactly one batch, so per-batch distinct-doc counts sum
    exactly); a distributed ``groupby(lang, term)`` reduces them; the
    global document frequency is a second, vocabulary-sized groupby over
    that reduced table (not over the corpus); one hash join brings
    df back to the tf rows and the per-lang top-k runs over tiny
    per-lang groups."""
    import collections

    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        langs_col = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        tf: dict = {}
        nd: dict = {}
        for lang, text in zip(langs_col, texts):
            toks = (text or "").strip().lower().split()
            c = tf.setdefault(lang, collections.Counter())
            c.update(toks)
            d = nd.setdefault(lang, collections.Counter())
            d.update(set(toks))
        rows_lang, rows_term, rows_n, rows_nd = [], [], [], []
        for lang, c in tf.items():
            d = nd[lang]
            for term, n in c.items():
                rows_lang.append(lang)
                rows_term.append(term)
                rows_n.append(n)
                rows_nd.append(d[term])
        return pa.table({
            "lang": pa.array(rows_lang, type=pa.string()),
            "term": pa.array(rows_term, type=pa.string()),
            "n": pa.array(rows_n, type=pa.int64()),
            "ndocs": pa.array(rows_nd, type=pa.int64()),
        })

    tf_tbl = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["lang", "term"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("ndocs", alias_name="ndocs"))
              .repartition(num_partitions))  # merge schema-less empties

    def df_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({"dterm": batch.column("term"),
                       "df": batch.column("ndocs")}).to_pandas()
        agg = df.groupby("dterm", as_index=False)["df"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    df_tbl = (tf_tbl.map_batches(df_partials, batch_format="pyarrow")
              .groupby("dterm")
              .aggregate(Sum("df", alias_name="df"))
              .repartition(num_partitions))
    joined = tf_tbl.join(df_tbl, join_type="inner",
                         num_partitions=num_partitions,
                         on=("term",), right_on=("dterm",))

    def score(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        s = (n.astype(np.int64) * scale) // dfv.astype(np.int64)
        return pa.table({
            "lang": batch.column("lang"),
            "term": batch.column("term"),
            "tfidf_scaled": pa.array(s, type=pa.int64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["tfidf_scaled", "term"],
                                  ascending=[False, True]).head(k))

    out = scored.groupby("lang").map_groups(topk, batch_format="pandas")
    return (out.to_pandas()
            .sort_values(["lang", "tfidf_scaled", "term"],
                         ascending=[True, False, True])
            .reset_index(drop=True))


def quantile_threshold_keep(ds: "ray.data.Dataset", q: float = 0.1,
                            lang_col: str = "lang",
                            val_col: str = "n_chars"):
    """Percentile-threshold filtering, the two-pass data-driven variant of
    a fixed length cutoff: pass 1 computes each group's EXACT q-quantile
    (:func:`length_quantiles_by_lang` histogram — only (group, value,
    count) rows move); pass 2 broadcasts the tiny per-group threshold
    table and counts survivors (``value >= threshold``) per group.
    Returns (lang, threshold, n_docs, n_kept) — all integers, so the SQL
    ``quantile_disc`` oracle compares exactly."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    qdf = length_quantiles_by_lang(ds, qs=(q,), lang_col=lang_col,
                                   val_col=val_col)
    col = f"p{round(q * 100):02d}"
    thresholds = dict(zip(qdf["lang"], (int(v) for v in qdf[col])))
    thr_ref = ray.put(thresholds)

    def keep_partials(batch: pa.Table, _cache={}) -> pa.Table:
        if "thr" not in _cache:
            _cache["thr"] = ray.get(thr_ref)
        thr = _cache["thr"]
        langs = batch.column(lang_col).to_pylist()
        vals = pc.cast(batch.column(val_col),
                       pa.int64()).to_numpy(zero_copy_only=False)
        t = np.fromiter((thr[l] for l in langs), dtype=np.int64,
                        count=len(langs))
        import pandas as pd
        df = pd.DataFrame({"lang": langs, "kept": vals >= t})
        agg = df.groupby("lang", as_index=False).agg(
            n_docs=("kept", "size"), n_kept=("kept", "sum"))
        agg["n_kept"] = agg["n_kept"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(ds.select_columns([lang_col, val_col]),
                             keep_partials, ["lang"],
                             {"n_docs": "sum", "n_kept": "sum"})
    out["threshold"] = out["lang"].map(thresholds).astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out[["lang", "threshold", "n_docs", "n_kept"]]


def sorted_rank_band(ds: "ray.data.Dataset", offset: int = 100,
                     limit: int = 10):
    """Global-ORDER-BY rank band (SQL ``ORDER BY n_chars DESC, doc_id
    LIMIT k OFFSET n``) through Ray's native distributed sort — the one
    operator family the repo's top-k paths deliberately avoid (they
    per-batch-reduce instead), exercised here on its own: a range-
    partitioned exchange that at scale moves every block, which is why
    only rank queries that genuinely need global order should use it.
    The driver pulls ``offset+limit`` rows (bounded), not the corpus."""
    import pandas as pd

    ranked = ds.select_columns(["doc_id", "n_chars"]) \
        .sort(["n_chars", "doc_id"], descending=[True, False])
    head = ranked.take(offset + limit)
    rows = head[offset:offset + limit]
    return pd.DataFrame({
        "doc_id": [r["doc_id"] for r in rows],
        "n_chars": [r["n_chars"] for r in rows],
    })


def term_cooccurrence(ds: "ray.data.Dataset", top_n: int = 20,
                      min_support: int = 2, limit: int = 50,
                      text_col: str = "text"):
    """Market-basket term co-occurrence mining: among the corpus's
    ``top_n`` terms by DOCUMENT frequency, count the documents in which
    each unordered pair co-occurs, keep pairs with support ≥
    ``min_support`` and return the ``limit`` strongest (n_docs desc,
    then lexicographic) — the A-priori support-counting primitive
    (reference analog: none; this is the pattern-mining family of the
    engine's text-analysis surface).

    Scale shape: pass 1 computes document frequencies with per-batch
    distinct-per-doc Counter partials (combiner before the groupby, so
    only batch-vocab rows shuffle) and takes the global top-n via the
    bounded ``topk_reduce``; pass 2 broadcasts that ≤top_n-term set via
    ``ray.put`` and emits per-batch pair-count partials — the pair key
    space is ≤ C(top_n, 2), so the final groupby is tiny and documents
    never move.  Ties at the top-n boundary and in the output break by
    term ascending, matching the SQL oracle's row_number order."""
    import collections

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import topk_reduce

    def df_partials(batch: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            c.update({t.lower() for t in (text or "").split()})
        return pa.table({
            "term": pa.array(list(c), type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64()),
        })

    doc_freq = (ds.select_columns([text_col])
                .map_batches(df_partials, batch_format="pyarrow")
                .groupby("term")
                .aggregate(Sum("n", alias_name="n")))
    top = topk_reduce(doc_freq, top_n, by=["n", "term"],
                      ascending=[False, True])
    vocab_ref = ray.put(frozenset(top["term"].tolist()))

    def pair_partials(batch: pa.Table, _cache={}) -> pa.Table:
        vocab = _cache.get("v")
        if vocab is None:
            vocab = _cache["v"] = ray.get(vocab_ref)
        c: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            present = sorted(
                {t.lower() for t in (text or "").split()} & vocab)
            for i, a in enumerate(present):
                for b in present[i + 1:]:
                    c[(a, b)] += 1
        keys = list(c)
        return pa.table({
            "term_a": pa.array([k[0] for k in keys], type=pa.string()),
            "term_b": pa.array([k[1] for k in keys], type=pa.string()),
            "n_docs": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    pairs = (ds.select_columns([text_col])
             .map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["term_a", "term_b"])
             .aggregate(Sum("n_docs", alias_name="n_docs"))
             .to_pandas())  # ≤ C(top_n, 2) rows by construction
    if pairs.empty:
        return pd.DataFrame({"term_a": pd.Series(dtype="object"),
                             "term_b": pd.Series(dtype="object"),
                             "n_docs": pd.Series(dtype="int64")})
    pairs = pairs[pairs["n_docs"] >= min_support]
    pairs["n_docs"] = pairs["n_docs"].astype("int64")
    return (pairs.sort_values(["n_docs", "term_a", "term_b"],
                              ascending=[False, True, True],
                              kind="mergesort")
            .head(limit).reset_index(drop=True))


def geomean_chars_by_lang(ds: "ray.data.Dataset", lang_col: str = "lang",
                          len_col: str = "n_chars"):
    """Grouped GEOMETRIC MEAN of document length per language — the
    log-domain mean aggregate (SQL ``exp(avg(ln(x)))``), the right
    central-tendency statistic for the heavy-tailed length
    distributions web corpora have (arithmetic means are dominated by
    the few megabyte-long pages).  Combiner shape: per-batch
    (lang, Σln(x), n) partials — one vectorized ``pc.ln`` over the
    Arrow column — merge distributively; only |langs|×blocks tiny rows
    ever move.  The result is rounded to 4 decimals on BOTH sides
    (here and in the oracle) so the float compare is anchored; the
    underlying double drift across summation orders is ~1e-9 relative.
    Requires x > 0 (n_chars ≥ 1 for non-empty docs); zero/negative
    lengths are excluded exactly like SQL ``ln`` would reject them,
    via an explicit filter mirrored in the oracle's WHERE."""
    import pandas as pd

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([lang_col, len_col])
        t = t.filter(pc.greater(t.column(len_col), 0))
        ln = pc.ln(pc.cast(t.column(len_col), pa.float64()))
        return (pa.table({lang_col: t.column(lang_col), "sum_ln": ln})
                .group_by([lang_col])
                .aggregate([("sum_ln", "sum"), ("sum_ln", "count")])
                .rename_columns([lang_col, "sum_ln", "n_docs"]))

    m = partial_then_merge(ds.select_columns([lang_col, len_col]),
                           partial, [lang_col],
                           {"sum_ln": "sum", "n_docs": "sum"})
    if m.empty:
        return pd.DataFrame({lang_col: pd.Series(dtype="object"),
                             "geo_mean_chars": pd.Series(dtype="float64"),
                             "n_docs": pd.Series(dtype="int64")})
    m["geo_mean_chars"] = np.round(np.exp(m["sum_ln"] / m["n_docs"]), 4)
    m["n_docs"] = m["n_docs"].astype("int64")
    return (m[[lang_col, "geo_mean_chars", "n_docs"]]
            .sort_values(lang_col).reset_index(drop=True))


def vocab_except(ds: "ray.data.Dataset", lang_a: str = "en",
                 lang_b: str = "de", k: int = 15,
                 text_col: str = "text", lang_col: str = "lang"):
    """Distributed SET DIFFERENCE on a derived relation (SQL ``EXCEPT``
    family): the ``k`` highest-document-frequency terms that occur in
    ``lang_a`` documents but in NO ``lang_b`` document.  Scale shape:
    per-batch combiner partials emit one row per distinct batch term —
    (term, a_docs = distinct-per-doc count in lang_a, in_b = 0/1
    presence flag in lang_b) — then ONE keyed groupby (Sum, Max) builds
    the per-term truth table; the anti-filter ``in_b = 0`` and the
    bounded ``topk_reduce`` keep the driver at O(k).  The term-keyed
    shuffle is inherent to set difference (both sides must meet per
    term); everything around it is a combiner.  Ties break term
    ascending, matching the oracle's ORDER BY."""
    import collections

    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from gruut_ray.pipelines.agg_util import topk_reduce

    def partials(batch: pa.Table) -> pa.Table:
        a_cnt: collections.Counter = collections.Counter()
        b_seen: set = set()
        langs = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for lang, text in zip(langs, texts):
            if lang == lang_a:
                a_cnt.update({t.lower() for t in (text or "").split()})
            elif lang == lang_b:
                b_seen.update(t.lower() for t in (text or "").split())
        terms = sorted(set(a_cnt) | b_seen)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "a_docs": pa.array([a_cnt.get(t, 0) for t in terms],
                               type=pa.int64()),
            "in_b": pa.array([int(t in b_seen) for t in terms],
                             type=pa.int64()),
        })

    per_term = (ds.select_columns([lang_col, text_col])
                .map_batches(partials, batch_format="pyarrow")
                .groupby("term")
                .aggregate(Sum("a_docs", alias_name="a_docs"),
                           Max("in_b", alias_name="in_b")))
    only_a = per_term.filter(
        expr="in_b == 0 and a_docs > 0")
    top = topk_reduce(only_a, k, by=["a_docs", "term"],
                      ascending=[False, True])
    if top.empty:
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "en_docs": pd.Series(dtype="int64")})
    out = top.rename(columns={"a_docs": "en_docs"})[["term", "en_docs"]]
    out["en_docs"] = out["en_docs"].astype("int64")
    return out.reset_index(drop=True)
