"""Training-mixture operators: source-weighted sampling and sequence
packing.

``mixture_sample`` rebalances a corpus to target per-source sampling
rates (the "data mixing" step of LLM corpus assembly — e.g. upweight
wiki, downsample CC) with a DETERMINISTIC per-row acceptance test: a
31-bit affine hash of the id column compared against the source's rate.
No shuffle, no RNG state, partition-invariant, and exactly expressible
in SQL — so the driver oracle can hash-check it.

``pack_sequences`` greedily packs documents into fixed token-budget
training sequences (first-fit-decreasing within each block) — the
"sequence packing" step before tokenized examples are written.  Packing
is inherently order-dependent, so it packs per block (the unit a
writer shard would consume) and reports per-pack fill statistics.
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data

from gruut_ray.pipelines.hash31 import M31 as _M31
from gruut_ray.pipelines.hash31 import affine31 as _accept_hash
from gruut_ray.pipelines.hash31 import affine31_sql as _affine31_sql


def mixture_sample(
    ds: "ray.data.Dataset",
    rates: typing.Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> "ray.data.Dataset":
    """Keep each row of source ``s`` iff
    ``hash31(id) < round(rates[s] * 2**31)`` — a deterministic thinning
    whose realized rate converges to ``rates[s]``.  Pure per-batch
    filter: streams, never shuffles, and the same row set survives
    under any partitioning."""
    thresholds = {s: int(round(r * _M31)) for s, r in rates.items()}
    default_thr = int(round(default_rate * _M31))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        h = _accept_hash(ids)
        srcs = batch.column(source_col).to_pylist()
        thr = np.fromiter((thresholds.get(s, default_thr) for s in srcs),
                          dtype=np.int64, count=len(srcs))
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample_counts(
    ds: "ray.data.Dataset",
    rates: typing.Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> pd.DataFrame:
    """Per-source (n_docs, sum_chars) of the mixture sample — the tiny
    verification rollup for the SQL oracle."""
    sampled = mixture_sample(ds, rates, source_col, id_col)

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select([source_col, len_col])
                .group_by([source_col])
                .aggregate([(len_col, "sum"), (len_col, "count")])
                .rename_columns([source_col, "sum_chars", "n_docs"]))

    from gruut_ray.pipelines.agg_util import partial_then_merge

    out = partial_then_merge(sampled, partial, [source_col],
                             {"sum_chars": "sum", "n_docs": "sum"})
    out["sum_chars"] = out["sum_chars"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return (out[[source_col, "n_docs", "sum_chars"]]
            .sort_values(source_col).reset_index(drop=True))


def mixture_oracle_sql(rates: typing.Mapping[str, float],
                       table: str = "documents") -> str:
    """The DuckDB-equivalent SQL for :func:`mixture_sample_counts`."""
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({int(round(r * _M31))} AS BIGINT)"
        for s, r in sorted(rates.items()))
    return f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM {table}
        WHERE {_affine31_sql('doc_id')}
              < (CASE source {cases} ELSE 0 END)
        GROUP BY source ORDER BY source
    """


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """First-fit-decreasing sequence packing per block: whitespace token
    counts, docs sorted longest-first, each placed in the first open
    pack with room (docs longer than ``seq_len`` get a pack alone —
    the downstream writer chunks them).  Returns the corpus-level
    packing summary ``(n_docs, n_packs, total_tokens, mean_fill)``
    where ``mean_fill`` is mean(pack_tokens / seq_len) over full-size
    packs; FFD guarantees every pack except possibly one per block is
    > half full, so mean_fill is bounded below (tested)."""

    def pack_block(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        toks = np.asarray([len((t or "").split()) for t in texts],
                          dtype=np.int64)
        order = np.argsort(-toks, kind="stable")
        pack_tokens: list = []
        for ti in toks[order]:
            ti = int(ti)
            if ti >= seq_len:
                pack_tokens.append(ti)
                continue
            for j in range(len(pack_tokens)):
                if pack_tokens[j] + ti <= seq_len:
                    pack_tokens[j] += ti
                    break
            else:
                pack_tokens.append(ti)
        arr = np.asarray(pack_tokens, dtype=np.int64)
        return pa.table({
            "n_docs": pa.array([len(texts)], type=pa.int64()),
            "n_packs": pa.array([len(arr)], type=pa.int64()),
            "total_tokens": pa.array([int(toks.sum())], type=pa.int64()),
            "fill_sum": pa.array(
                [float((np.minimum(arr, seq_len) / seq_len).sum())],
                type=pa.float64()),
        })

    parts = ds.map_batches(pack_block, batch_format="pyarrow").to_pandas()
    n_packs = int(parts["n_packs"].sum())
    return pd.DataFrame({
        "n_docs": [int(parts["n_docs"].sum())],
        "n_packs": [n_packs],
        "total_tokens": [int(parts["total_tokens"].sum())],
        "mean_fill": [round(float(parts["fill_sum"].sum())
                            / max(n_packs, 1), 6)],
    })
