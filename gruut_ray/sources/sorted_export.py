"""Globally-sorted, range-partitioned parquet export.

The storage layout a 100-TB pipeline wants for anything consumed by
range scans (id lookups, time slices, merge joins): the dataset is
split into ``num_ranges`` key ranges, each range is written as ONE
sorted parquet file, and a boundary manifest records the split points
plus per-range (min, max, rows) — so a reader can prune files by key
range without touching footers, and a failed export resumes per range.

Scale shape: split points come from the deterministic bottom-k-by-hash
sample (mergeable, partition-invariant — same sketch the quantile
operator uses); one ``map_batches`` pass tags rows with their range id
(vectorized ``np.searchsorted`` against the broadcast boundaries); a
keyed repartition co-locates each range; each range then sorts and
writes independently inside its own task (no global sort barrier — the
only all-to-all is the keyed repartition every distributed sort needs
anyway).  Ranges already exported by a previous run (file + sidecar
present, same boundaries) are skipped.
"""

from __future__ import annotations

import json
import os
import typing

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

if typing.TYPE_CHECKING:
    import ray.data

MANIFEST = "_sorted_manifest.json"


def _boundaries(ds: "ray.data.Dataset", col: str, id_col: str,
                num_ranges: int, sample_k: int = 20_000) -> np.ndarray:
    """num_ranges−1 split points from the bottom-k-by-hash sample."""
    from gruut_ray.pipelines.agg_util import topk_reduce
    from gruut_ray.pipelines.hash31 import affine31

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = affine31(ids)
        order = np.lexsort((ids, h))[:sample_k]
        return pa.table({
            "h": pa.array(h[order]),
            id_col: pa.array(ids[order]),
            col: batch.column(col).take(pa.array(order, type=pa.int64())),
        })

    parts = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pyarrow")
    sample = topk_reduce(parts, sample_k, by=["h", id_col],
                         ascending=[True, True])[col].to_numpy()
    qs = np.linspace(0, 1, num_ranges + 1)[1:-1]
    return np.unique(np.quantile(np.sort(sample), qs,
                                 method="lower"))


def sorted_export(ds: "ray.data.Dataset", out_dir: str, col: str,
                  id_col: str, num_ranges: int = 8,
                  resume: bool = True) -> dict:
    """Export ``ds`` sorted by (col, id_col) into range files under
    ``out_dir``; returns the manifest dict."""
    import ray
    from ray.data.context import ShuffleStrategy

    os.makedirs(out_dir, exist_ok=True)
    bounds = _boundaries(ds, col, id_col, num_ranges)
    n_ranges = len(bounds) + 1
    bounds_ref = ray.put(bounds)

    done: typing.Set[int] = set()
    if resume and os.path.exists(os.path.join(out_dir, MANIFEST)):
        with open(os.path.join(out_dir, MANIFEST)) as f:
            prev = json.load(f)
        if prev.get("boundaries") == [int(b) for b in bounds]:
            done = {r["range_id"] for r in prev.get("ranges", [])
                    if os.path.exists(os.path.join(
                        out_dir, f"range-{r['range_id']:05d}.parquet"))}

    def tag(batch: pa.Table, _cache={}) -> pa.Table:
        b = _cache.get(bounds_ref)
        if b is None:
            _cache.clear()
            b = _cache[bounds_ref] = ray.get(bounds_ref)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        rid = np.searchsorted(b, vals, side="right")
        return batch.append_column("_range", pa.array(rid,
                                                      type=pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    prev_strategy = tagged.context.shuffle_strategy
    tagged.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        keyed = tagged.repartition(n_ranges, keys=["_range"])

        def write_range(df: pd.DataFrame) -> pd.DataFrame:
            out_rows = []
            for rid, grp in df.groupby("_range"):
                rid = int(rid)
                if rid in done:
                    continue
                g = grp.sort_values([col, id_col],
                                    kind="mergesort").drop(
                    columns=["_range"])
                path = os.path.join(out_dir,
                                    f"range-{rid:05d}.parquet")
                tmp = path + ".tmp"
                pq.write_table(
                    pa.Table.from_pandas(g, preserve_index=False)
                    .replace_schema_metadata(None), tmp)
                os.replace(tmp, path)
                out_rows.append((rid, len(g), int(g[col].min()),
                                 int(g[col].max())))
            return pd.DataFrame(out_rows, columns=["range_id", "rows",
                                                   "min", "max"])

        stats = keyed.map_batches(write_range, batch_format="pandas",
                                  batch_size=None).to_pandas()
    finally:
        tagged.context.shuffle_strategy = prev_strategy

    ranges = [{"range_id": int(r), "rows": int(n),
               "min": int(lo), "max": int(hi)}
              for r, n, lo, hi in zip(stats["range_id"], stats["rows"],
                                      stats["min"], stats["max"])] \
        if len(stats) else []
    if resume and done and os.path.exists(os.path.join(out_dir, MANIFEST)):
        with open(os.path.join(out_dir, MANIFEST)) as f:
            prev = json.load(f)
        ranges += [r for r in prev.get("ranges", [])
                   if r["range_id"] in done]
    manifest = {
        "sort_col": col,
        "id_col": id_col,
        "boundaries": [int(b) for b in bounds],
        "ranges": sorted(ranges, key=lambda r: r["range_id"]),
        "num_rows": sum(r["rows"] for r in ranges),
    }
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def prune_ranges(out_dir: str, lo: int, hi: int) -> typing.List[str]:
    """Files that can contain sort-col values in [lo, hi] — manifest
    boundary pruning, no parquet footer reads."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    out = []
    for r in manifest["ranges"]:
        if r["max"] >= lo and r["min"] <= hi:
            out.append(os.path.join(out_dir,
                                    f"range-{r['range_id']:05d}.parquet"))
    return out
