"""Per-partition checkpoint manifests for resumable runs (SURVEY §4).

Output layout::

    out_dir/
      part=00000/data-*.parquet     (written by ray Dataset.write_parquet)
      part=00000/manifest.json      (written after the partition completes)
      _run_manifest.json            (run-level summary, written last)

Resume = list existing ``manifest.json`` files, skip those partitions.
Partition = contiguous input row-id range (synthetic source) or input file
fragment (parquet source), so any failed run can be continued by
reprocessing only the missing partitions.
"""

from __future__ import annotations

import json
import os
import time
import typing

MANIFEST_NAME = "manifest.json"
RUN_MANIFEST_NAME = "_run_manifest.json"


def partition_dir(out_dir: str, part_id: int) -> str:
    # Matches ray Dataset.write_parquet(partition_cols=["part"]) layout
    return os.path.join(out_dir, f"part={part_id}")


def write_partition_manifest(out_dir: str, part_id: int,
                             payload: typing.Dict[str, typing.Any]) -> None:
    """Atomic write (tmp + rename) so a crash never leaves a half manifest."""
    pdir = partition_dir(out_dir, part_id)
    os.makedirs(pdir, exist_ok=True)
    payload = dict(payload, part_id=part_id, completed_at=time.time())
    tmp = os.path.join(pdir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(pdir, MANIFEST_NAME))


def completed_partitions(out_dir: str) -> typing.Dict[int, dict]:
    done = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        mpath = os.path.join(out_dir, name, MANIFEST_NAME)
        if name.startswith("part=") and os.path.isfile(mpath):
            try:
                with open(mpath) as f:
                    payload = json.load(f)
                done[int(name.split("=", 1)[1])] = payload
            except (ValueError, json.JSONDecodeError):
                continue
    return done


def write_run_manifest(out_dir: str, payload: typing.Dict[str, typing.Any]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, RUN_MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(dict(payload, completed_at=time.time()), f, default=str)
    os.replace(tmp, os.path.join(out_dir, RUN_MANIFEST_NAME))


def input_lineage(ds) -> typing.Dict[str, typing.Any]:
    """Lineage of a Dataset's input fragments: the file list plus a hash
    over (path, size, mtime) of each (SURVEY §4 — manifests must carry
    the input fragment list so resume can tell "same partition id" from
    "same data").  Remote paths that can't be stat'ed contribute path
    only; a dataset with no file inputs (synthetic) hashes to a sentinel
    so resume still works but never false-matches a file-backed run."""
    import hashlib

    try:
        files = sorted(ds.input_files() or [])
    except Exception:  # noqa: BLE001 — non-file sources
        files = []
    h = hashlib.sha256()
    fragments: typing.List[dict] = []
    for path in files:
        frag: typing.Dict[str, typing.Any] = {"path": path}
        try:
            st = os.stat(path)
            frag["size"] = st.st_size
            frag["mtime"] = st.st_mtime
        except OSError:
            pass
        fragments.append(frag)
        h.update(json.dumps(frag, sort_keys=True).encode())
    if not fragments:
        h.update(b"<no-file-inputs>")
    return {"fragments": fragments, "lineage_hash": h.hexdigest()}
