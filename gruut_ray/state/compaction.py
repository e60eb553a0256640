"""Small-file compaction for partitioned parquet output.

At 10^12-document scale the partitioned sink inevitably produces
straggler partitions: a skewed hash bucket, a resumed run, or a
filter-heavy input leaves directories holding many files far below the
ideal scan unit, and downstream readers pay per-file open/footer costs.
This operator rewrites an output tree in place-adjacent fashion:

* partitions whose total bytes are already ≥ ``target_bytes`` (or hold
  a single file) are LEFT UNTOUCHED — compaction must be safe to run
  repeatedly and cost only what it fixes (idempotence is tested);
* each undersized partition is rewritten as ONE parquet file by a Ray
  task (partitions compact in parallel; no partition's data ever moves
  through the driver), written atomically (temp name → rename, old
  files removed after the new file lands);
* the partition manifest is updated with a ``compaction`` record
  (files before/after, bytes, pass id) so lineage-gated resume keeps
  working — row counts are preserved exactly and re-verified from the
  parquet footers before old files are deleted.
"""

from __future__ import annotations

import os
import typing

from gruut_ray.state import manifest as mf


def _parquet_files(part_dir: str) -> typing.List[str]:
    return sorted(
        os.path.join(part_dir, f) for f in os.listdir(part_dir)
        if f.endswith(".parquet"))


def compact_partition(part_dir: str) -> dict:
    """Merge every parquet file in ``part_dir`` into one (runs inside a
    Ray task).  Returns a summary dict; raises if row counts differ."""
    import pyarrow.parquet as pq

    files = _parquet_files(part_dir)
    rows_before = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    bytes_before = sum(os.path.getsize(f) for f in files)
    tmp = os.path.join(part_dir, ".compact.parquet.tmp")
    writer = None
    try:
        for f in files:
            pf = pq.ParquetFile(f)
            for rg in range(pf.num_row_groups):
                tbl = pf.read_row_group(rg)
                if writer is None:
                    writer = pq.ParquetWriter(tmp, tbl.schema)
                writer.write_table(tbl)
        if writer is not None:
            writer.close()
            writer = None
        rows_after = pq.ParquetFile(tmp).metadata.num_rows \
            if os.path.exists(tmp) else 0
        if rows_after != rows_before:
            raise RuntimeError(
                f"compaction row mismatch in {part_dir}: "
                f"{rows_before} -> {rows_after}")
        final = os.path.join(part_dir, "compacted-0.parquet")
        os.replace(tmp, final)
        for f in files:
            if os.path.abspath(f) != os.path.abspath(final):
                os.remove(f)
    finally:
        if writer is not None:
            writer.close()
        if os.path.exists(tmp):
            os.remove(tmp)
    return {
        "files_before": len(files),
        "files_after": 1,
        "rows": rows_before,
        "bytes_before": bytes_before,
        "bytes_after": os.path.getsize(
            os.path.join(part_dir, "compacted-0.parquet")),
    }


def compact_output(out_dir: str, target_bytes: int = 128 * 2 ** 20,
                   ) -> dict:
    """Compact every undersized completed partition under ``out_dir``
    (parallel Ray tasks, one per partition).  Returns totals."""
    import ray

    done = mf.completed_partitions(out_dir)
    todo = []
    for part_id in sorted(done):
        part_dir = mf.partition_dir(out_dir, part_id)
        files = _parquet_files(part_dir)
        total = sum(os.path.getsize(f) for f in files)
        if len(files) <= 1 or total >= target_bytes:
            continue
        todo.append((part_id, part_dir))

    @ray.remote(num_cpus=1)
    def _task(part_dir: str) -> dict:
        return compact_partition(part_dir)

    results = ray.get([_task.remote(d) for _, d in todo])
    for (part_id, part_dir), res in zip(todo, results):
        payload = dict(done[part_id])
        passes = payload.get("compaction", [])
        passes.append({"pass": len(passes) + 1, **res})
        payload["compaction"] = passes
        mf.write_partition_manifest(out_dir, part_id, payload)
    return {
        "partitions_seen": len(done),
        "partitions_compacted": len(todo),
        "files_removed": sum(r["files_before"] - 1 for r in results),
        "rows": sum(r["rows"] for r in results),
    }
