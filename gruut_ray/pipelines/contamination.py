"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out benchmark/eval set (the GPT-3 §C / PaLM-style
overlap check).

Scale shape: the benchmark side is SMALL by construction (eval suites are
thousands of documents, not billions) — its distinct n-gram hash set is
collected once and broadcast via ``ray.put``; the corpus side then streams
through one shuffle-free ``map_batches`` that counts per-document overlap
against the in-memory set.  Nothing about the corpus is materialized and
no all-to-all exchange happens at any size.  If the benchmark set ever
outgrew worker memory, the fallback is a hash-partitioned semi-join on
gram hashes (both sides bucketed by ``hash(gram)``), which this module
deliberately does not need for its stated input shape.
"""

from __future__ import annotations

import hashlib
import typing

import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data


def _gram_hashes(text: str, n: int) -> set:
    """Distinct word-``n``-gram 128-bit hashes of one document.

    Words split on whitespace after trim (the repo-wide convention shared
    with the DuckDB oracle's ``regexp_split_to_array(trim(text),
    '\\s+')``); a document with fewer than ``n`` words has no grams.
    Hashing the joined gram (blake2b-128) stands in for the string with
    collision odds ~2^-64 per pair — the oracle compares the strings
    themselves, which bit-matches at any realistic corpus size."""
    words = text.split() if text and text.strip() else []
    if len(words) < n:
        return set()
    return {
        hashlib.blake2b(" ".join(words[i:i + n]).encode(),
                        digest_size=16).digest()
        for i in range(len(words) - n + 1)
    }


def contamination_overlap(
    corpus: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-corpus-document overlap with the benchmark's n-gram set.

    Returns a pandas DataFrame ``(doc_id, n_grams, n_hit_grams)`` over
    ALL corpus docs (distinct grams per doc; ``n_hit_grams`` of them
    also occur anywhere in the benchmark).  Downstream decontamination
    drops or trims docs above an overlap threshold."""
    import pandas as pd
    import ray

    # benchmark side: per-batch distinct-gram partials, unioned on the
    # driver (bounded by the benchmark's size, not the corpus's)
    def bench_grams(batch: pa.Table) -> pa.Table:
        grams: set = set()
        for t in batch.column(text_col).to_pylist():
            grams |= _gram_hashes(t or "", n)
        return pa.table({"g": pa.array(list(grams), type=pa.binary(16))})

    bench_set: set = set()
    for b in (benchmark.map_batches(bench_grams, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        bench_set.update(b.column("g").to_pylist())
    bench_ref = ray.put(bench_set)  # one object-store copy per node

    def count_overlap(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy handle after first fetch
        ids, totals, hits = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            grams = _gram_hashes(t or "", n)
            ids.append(i)
            totals.append(len(grams))
            hits.append(sum(1 for g in grams if g in bench))
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_grams": pa.array(totals, type=pa.int64()),
            "n_hit_grams": pa.array(hits, type=pa.int64()),
        })

    out = corpus.map_batches(count_overlap, batch_format="pyarrow")
    return (out.to_pandas().sort_values(id_col).reset_index(drop=True))
