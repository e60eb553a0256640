#!/usr/bin/env python
"""Deterministically scale a testdata sf directory by tiling.

Builds an sf-N× copy of a source sf dir (default sf0.1 → ~sf1) by
stacking ``--tiles`` copies of every table with per-tile offsets added
to every id/key column.  Offsets are applied CONSISTENTLY across tables
(an order's o_custkey moves with its customer's c_custkey), so joins,
anti-joins and groupbys behave exactly as they would on organically
larger data; the offset is a multiple of 100 so ``doc_id % 20`` /
``% 100`` sampling splits keep their semantics.  region/nation are
fixed dimensions and copy through unchanged.

Text / embedding payloads repeat across tiles — intentional: dedup
operators see real cross-tile duplicates, and the DuckDB oracle sees
the identical table, so the correctness gate stays exact.

Usage: python jobs/make_sf_tiles.py --src /root/testdata/sf0.1 \
           --dst /tmp/sf1 --tiles 10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000  # per-tile key offset (multiple of 100 and 20)

# key columns shifted by tile*OFFSET, per table
KEY_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# fixed dimensions: one copy only (customers of every tile share them)
SINGLE_COPY = {"region", "nation"}


def tile_table(src_path: str, dst_path: str, keys: list[str],
               tiles: int) -> int:
    base = pq.read_table(src_path)
    base = base.replace_schema_metadata(None)
    writer = pq.ParquetWriter(dst_path, base.schema)
    total = 0
    for i in range(tiles):
        t = base
        for k in keys:
            shifted = pc.add(t.column(k), pa.scalar(i * OFFSET,
                                                    type=pa.int64()))
            t = t.set_column(t.schema.get_field_index(k), k,
                             shifted.cast(t.schema.field(k).type))
        writer.write_table(t)
        total += t.num_rows
        if not keys:  # fixed dimension: single copy
            break
    writer.close()
    return total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--tiles", type=int, default=10)
    args = ap.parse_args(argv)

    os.makedirs(args.dst, exist_ok=True)
    for table, keys in KEY_COLS.items():
        src = os.path.join(args.src, f"{table}.parquet")
        dst = os.path.join(args.dst, f"{table}.parquet")
        n = tile_table(src, dst, keys,
                       1 if table in SINGLE_COPY else args.tiles)
        print(f"{table}: {n} rows -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
