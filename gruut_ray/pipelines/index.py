"""Distributed inverted-index build + bucket-pruned TF-IDF lookup.

The retrieval operator of a training-data pipeline (candidate fetch
for decontamination / dedup audits / corpus exploration): build a
term → postings index as PARTITIONED parquet, then answer term queries
reading only the buckets that can contain them.

Scale shape
-----------
Build: one ``map_batches`` pass emits per-batch (term, doc_id, tf)
partials (tf summed within the batch); a keyed hash repartition on the
term's bucket co-locates every posting of a term; one kernel per
bucket merges postings into (term, df, postings list) rows and writes
``bucket=<i>/part-<hash>.parquet`` — written to a temp name then
``os.replace``d (a crash never leaves a truncated file a resume would
trust), with a content-hash fragment name so (a) a keyed partition
that Ray splits into multiple batches writes multiple fragments
instead of silently overwriting one file, and (b) re-runs are
idempotent (same content → same name).  The bucket DIRECTORY is the
resume unit; lookup merges a term's postings (and sums its df) across
fragments before computing idf.  Document rows are read once; only
(term, doc_id, tf) partials shuffle.

Lookup: hash the query terms to their buckets and read ONLY those
parquet files (bucket pruning — at 4096 buckets a 3-term query touches
≤ 3/4096 of the index bytes); score docs by exact integer TF-IDF
(``tf × idf_ppm`` with ``idf_ppm = N·10⁶ // df``) so results are
deterministic and SQL-replayable.
"""

from __future__ import annotations

import os
import typing

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

if typing.TYPE_CHECKING:
    import ray.data

def _bucket_of(term: str, num_buckets: int) -> int:
    # md5-based bucket: deterministic across processes (never Python's
    # salted hash()); the oracle replays scores, not bucket layout
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) \
        % num_buckets


def build_inverted_index(ds: "ray.data.Dataset", out_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 16,
                         num_partitions: int = 16) -> dict:
    """Build the index under ``out_dir``; returns a manifest dict
    (num_docs, num_terms, num_buckets, per-bucket term counts)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    def tf_partials(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_t: typing.List[str] = []
        out_d: typing.List[int] = []
        out_f: typing.List[int] = []
        for i, text in zip(ids, batch.column(text_col).to_pylist()):
            counts: typing.Dict[str, int] = {}
            for tok in (text or "").lower().split():
                counts[tok] = counts.get(tok, 0) + 1
            out_t.extend(counts.keys())
            out_d.extend([int(i)] * len(counts))
            out_f.extend(counts.values())
        buckets = [_bucket_of(t, num_buckets) for t in out_t]
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int64()),
            "term": pa.array(out_t, type=pa.string()),
            id_col: pa.array(out_d, type=pa.int64()),
            "tf": pa.array(out_f, type=pa.int64()),
        })

    n_docs = ds.count()
    parts = ds.select_columns([id_col, text_col]) \
        .map_batches(tf_partials, batch_format="pyarrow")

    from ray.data.context import ShuffleStrategy

    prev = parts.context.shuffle_strategy
    parts.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        keyed = parts.repartition(num_buckets, keys=["bucket"])

        def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            if df.empty:
                return pd.DataFrame({"bucket": np.array([], np.int64),
                                     "n_terms": np.array([], np.int64)})
            out_rows = []
            for b, grp in df.groupby("bucket"):
                g = (grp.groupby(["term", id_col], as_index=False)["tf"]
                     .sum().sort_values(["term", id_col]))
                terms = []
                dfs = []
                postings = []
                for term, tg in g.groupby("term", sort=True):
                    terms.append(term)
                    dfs.append(len(tg))
                    postings.append(list(zip(tg[id_col].astype(int),
                                             tg["tf"].astype(int))))
                tbl = pa.table({
                    "term": pa.array(terms, type=pa.string()),
                    "df": pa.array(dfs, type=pa.int64()),
                    "postings": pa.array(
                        postings,
                        type=pa.list_(pa.struct([
                            ("doc_id", pa.int64()),
                            ("tf", pa.int64())]))),
                })
                h = hashlib.md5()
                h.update("\x00".join(terms).encode())
                h.update(np.asarray(dfs, np.int64).tobytes())
                h.update(g[id_col].to_numpy(dtype=np.int64).tobytes())
                token = h.hexdigest()[:12]
                bdir = os.path.join(out_dir, f"bucket={int(b)}")
                os.makedirs(bdir, exist_ok=True)
                final = os.path.join(bdir, f"part-{token}.parquet")
                tmp = os.path.join(bdir, f".tmp-{token}.parquet")
                pq.write_table(tbl, tmp)
                os.replace(tmp, final)  # atomic: no truncated fragments
                out_rows.append((int(b), len(terms)))
            return pd.DataFrame(out_rows, columns=["bucket", "n_terms"])

        stats = keyed.map_batches(write_bucket, batch_format="pandas",
                                  batch_size=None).to_pandas()
    finally:
        parts.context.shuffle_strategy = prev
    return {
        "num_docs": int(n_docs),
        "num_buckets": num_buckets,
        # sums per-fragment counts: an upper bound on distinct terms
        # when Ray split a keyed partition into multiple fragments
        "num_terms": int(stats["n_terms"].sum()) if len(stats) else 0,
        "buckets_written": sorted({int(b) for b in stats["bucket"]})
        if len(stats) else [],
    }


def _bucket_fragments(index_dir: str, bucket: int) -> typing.List[str]:
    """All committed parquet fragments of one bucket (legacy single-file
    layout still accepted); ``.tmp-*`` files from a crashed writer are
    never visible because fragments commit via ``os.replace``."""
    paths = []
    legacy = os.path.join(index_dir, f"bucket={bucket}.parquet")
    if os.path.exists(legacy):
        paths.append(legacy)
    bdir = os.path.join(index_dir, f"bucket={bucket}")
    if os.path.isdir(bdir):
        paths.extend(os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                     if f.endswith(".parquet") and not f.startswith("."))
    return paths


def index_lookup(index_dir: str, terms: typing.Sequence[str],
                 num_docs: int, num_buckets: int = 16,
                 k: int = 10) -> pd.DataFrame:
    """Top-k docs for the query terms by exact integer TF-IDF
    (``score = Σ tf × (num_docs·10⁶ // df)``), reading only the buckets
    the terms hash to.  Ties break by doc_id ascending."""
    wanted = sorted({t.lower() for t in terms})
    buckets = sorted({_bucket_of(t, num_buckets) for t in wanted})
    # merge each term's fragments FIRST (per-doc tf sums; df = distinct
    # docs after the merge) so idf is computed from the term's true
    # document frequency even when a bucket was written as multiple
    # fragments that both saw the term
    per_term: typing.Dict[str, typing.Dict[int, int]] = {}
    for b in buckets:
        for path in _bucket_fragments(index_dir, b):
            tbl = pq.read_table(path)
            mask = pc.is_in(tbl.column("term"),
                            value_set=pa.array(wanted, type=pa.string()))
            tbl = tbl.filter(mask)
            for term, postings in zip(
                    tbl.column("term").to_pylist(),
                    tbl.column("postings").to_pylist()):
                docs = per_term.setdefault(term, {})
                for post in postings:
                    d = post["doc_id"]
                    docs[d] = docs.get(d, 0) + post["tf"]
    scores: typing.Dict[int, int] = {}
    for docs in per_term.values():
        idf_ppm = num_docs * 1_000_000 // len(docs)
        for d, tf in docs.items():
            scores[d] = scores.get(d, 0) + tf * idf_ppm
    if not scores:
        return pd.DataFrame(columns=["doc_id", "score_ppm"])
    out = pd.DataFrame(sorted(scores.items()),
                       columns=["doc_id", "score_ppm"])
    out = out.sort_values(["score_ppm", "doc_id"],
                          ascending=[False, True]).head(k)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score_ppm"] = out["score_ppm"].astype("int64")
    return out.reset_index(drop=True)
