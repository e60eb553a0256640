"""WebDataset-style sharded-tar sink, as a native Ray ``Datasink``.

WebDataset (public format: github.com/webdataset/webdataset) stores one
training sample as adjacent tar entries sharing a key stem —
``{key}.txt`` for the payload, ``{key}.json`` for metadata — across a
sequence of fixed-size ``shard-NNNNNN.tar`` files.  Training loaders
stream shards sequentially, so the sink's jobs are: bound shard size,
name shards deterministically, and leave a manifest for resume/audit.

Ray-Data-native shape: ``ds.write_datasink(WebDatasetSink(...))`` — the
streaming executor calls ``write()`` once per write task with that
task's blocks; ``ctx.task_idx`` gives a stable shard-name prefix, so a
re-run overwrites its own shards instead of duplicating them
(idempotent per task).  ``on_write_complete`` aggregates every task's
shard stats into ``manifest.json`` (shard → rows/bytes/first+last key),
the same lineage pattern as ``run_to_parquet``'s partition manifests.

Pure stdlib ``tarfile``; no external deps.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import typing

import pyarrow as pa

from ray.data import Datasink
from ray.data.datasource.datasink import WriteResult

if typing.TYPE_CHECKING:
    from ray.data._internal.execution.interfaces.task_context import (
        TaskContext,
    )


class WebDatasetSink(Datasink):
    """Write ``(id, text, *meta)`` rows as WebDataset tar shards."""

    def __init__(self, out_dir: str, id_col: str = "doc_id",
                 text_col: str = "text",
                 meta_cols: typing.Sequence[str] = (),
                 rows_per_shard: int = 10_000):
        self.out_dir = out_dir
        self.id_col = id_col
        self.text_col = text_col
        self.meta_cols = list(meta_cols)
        self.rows_per_shard = rows_per_shard

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)

    @staticmethod
    def _add_bytes(tf: tarfile.TarFile, name: str, payload: bytes,
                   mtime: int = 0) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(payload)
        info.mtime = mtime  # fixed → byte-identical shards across runs
        tf.addfile(info, io.BytesIO(payload))

    def write(self, blocks: typing.Iterable, ctx: "TaskContext") -> list:
        shards: list = []
        shard_idx = 0
        tf = None
        path = None
        rows = first_key = last_key = None

        def open_shard():
            nonlocal tf, path, rows, first_key, shard_idx
            path = os.path.join(
                self.out_dir,
                f"shard-{ctx.task_idx:05d}-{shard_idx:05d}.tar")
            tf = tarfile.open(path, "w")
            rows = 0
            first_key = None
            shard_idx += 1

        def close_shard():
            nonlocal tf
            if tf is None:
                return
            tf.close()
            shards.append({
                "shard": os.path.basename(path),
                "rows": rows,
                "bytes": os.path.getsize(path),
                "first_key": first_key,
                "last_key": last_key,
            })
            tf = None

        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if block.num_rows == 0:
                continue
            ids = block.column(self.id_col).to_pylist()
            texts = block.column(self.text_col).to_pylist()
            metas = {c: block.column(c).to_pylist()
                     for c in self.meta_cols}
            for i, (key, text) in enumerate(zip(ids, texts)):
                if tf is None or rows >= self.rows_per_shard:
                    close_shard()
                    open_shard()
                stem = f"{int(key):012d}"
                self._add_bytes(tf, stem + ".txt",
                                (text or "").encode("utf-8"))
                if self.meta_cols:
                    meta = {c: metas[c][i] for c in self.meta_cols}
                    self._add_bytes(
                        tf, stem + ".json",
                        json.dumps(meta, sort_keys=True,
                                   default=str).encode("utf-8"))
                rows += 1
                if first_key is None:
                    first_key = stem
                last_key = stem
        close_shard()
        return shards

    def on_write_complete(self, write_result: "WriteResult[list]") -> None:
        shards = [s for task_shards in write_result.write_returns
                  for s in task_shards]
        shards.sort(key=lambda s: s["shard"])
        manifest = {
            "format": "webdataset-tar",
            "num_rows": int(write_result.num_rows),
            "num_shards": len(shards),
            "rows_per_shard": self.rows_per_shard,
            "shards": shards,
        }
        with open(os.path.join(self.out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        # drop shards from a PREVIOUS run that this run didn't rewrite:
        # WebDataset loaders glob shard-*.tar (not the manifest), so a
        # stale shard would feed deleted samples back into training
        current = {s["shard"] for s in shards}
        for name in os.listdir(self.out_dir):
            if (name.startswith("shard-") and name.endswith(".tar")
                    and name not in current):
                os.unlink(os.path.join(self.out_dir, name))


def write_webdataset(ds, out_dir: str, id_col: str = "doc_id",
                     text_col: str = "text",
                     meta_cols: typing.Sequence[str] = (),
                     rows_per_shard: int = 10_000) -> dict:
    """Write ``ds`` as WebDataset shards + manifest; returns the parsed
    manifest."""
    ds.write_datasink(WebDatasetSink(out_dir, id_col, text_col,
                                     meta_cols, rows_per_shard))
    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)


def read_webdataset_keys(out_dir: str) -> list:
    """Audit helper: stream every shard in manifest order and return the
    sample keys (tar stems) — used by tests to prove round-trip
    integrity without loading payloads into memory at once."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    keys = []
    for s in manifest["shards"]:
        with tarfile.open(os.path.join(out_dir, s["shard"])) as tf:
            for m in tf.getmembers():
                if m.name.endswith(".txt"):
                    keys.append(m.name[:-4])
    return keys
