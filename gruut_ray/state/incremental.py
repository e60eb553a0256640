"""Cross-run incremental deduplication state (SURVEY §4 + §2.7).

A 100-TB crawl is processed in daily increments.  Re-joining today's
batch against ALL history fingerprints is an ever-growing all-to-all
join; instead, history is summarized in a fixed-size Bloom filter
persisted next to the run manifests.  Today's run drops probable-dups
with a shuffle-free broadcast probe (``ray.put`` once, probed per Arrow
batch), exact-dedups within the increment, streams survivors to
partitioned parquet, then folds the survivors' fingerprints into the
filter for tomorrow — every step streaming, nothing pinned in the
object store.

Accuracy contract (tested): the probe has NO false negatives, so no
document already in history ever survives.  False positives drop
genuinely-new documents at ≈ the configured fp rate (default 1%) —
the standard trade for crawl dedup, where a ~1% over-drop is noise
against the storage/compute of an exact history join.  The filter's
geometry is fixed at first use, so size ``n_items_hint`` for the
CUMULATIVE corpus across all planned runs; ``report["fp_estimate"]``
rises as the filter saturates and ``rebuild_recommended`` flips on at
3× the target rate.
"""

from __future__ import annotations

import json
import os
import time
import typing

import pyarrow as pa
import pyarrow.compute as pc

from gruut_ray.pipelines.sketches import BloomFilter, build_bloom, mark_seen

if typing.TYPE_CHECKING:
    import ray.data

STATE_NAME = "bloom_state.bin"
META_NAME = "bloom_state.json"


def load_state(state_dir: str) -> typing.Tuple[
        typing.Optional[BloomFilter], typing.Dict[str, typing.Any]]:
    """Load the persisted history filter, or ``(None, {})`` on first run."""
    path = os.path.join(state_dir, STATE_NAME)
    if not os.path.isfile(path):
        return None, {}
    with open(path, "rb") as f:
        bloom = BloomFilter.from_bytes(f.read())
    meta: typing.Dict[str, typing.Any] = {}
    mpath = os.path.join(state_dir, META_NAME)
    if os.path.isfile(mpath):
        try:
            with open(mpath) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError):
            meta = {}
    return bloom, meta


def save_state(state_dir: str, bloom: BloomFilter,
               meta: typing.Dict[str, typing.Any]) -> None:
    """Atomic (tmp + rename) so a crash mid-save keeps yesterday's state;
    bytes first, meta last — a meta without bytes never happens."""
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, STATE_NAME + ".tmp")
    with open(tmp, "wb") as f:
        f.write(bloom.to_bytes())
    os.replace(tmp, os.path.join(state_dir, STATE_NAME))
    tmp = os.path.join(state_dir, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(dict(meta, saved_at=time.time()), f)
    os.replace(tmp, os.path.join(state_dir, META_NAME))


def filter_new(ds: "ray.data.Dataset", bloom: BloomFilter,
               col: str) -> "ray.data.Dataset":
    """Drop rows whose ``col`` probably appeared in history (lazy,
    shuffle-free; composable into a larger pipeline)."""
    marked = mark_seen(ds, bloom, col)
    return marked.map_batches(
        lambda b: b.filter(
            pc.invert(b.column("probably_seen"))
        ).drop_columns(["probably_seen"]),
        batch_format="pyarrow")


def incremental_dedup_run(
    ds: "ray.data.Dataset",
    state_dir: str,
    out_dir: str,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    n_items_hint: typing.Optional[int] = None,
    fp_rate: float = 0.01,
    within_run: bool = True,
) -> typing.Dict[str, typing.Any]:
    """One increment: history-probe → exact dedup within the increment →
    stream survivors to parquet → fold survivors into the filter → save.

    The filter update reads back the WRITTEN parquet (not the in-memory
    dataset), so the increment is never materialized in the object store
    and a crash between write and state-save leaves a re-runnable step
    (re-running re-drops the same rows: the probe is deterministic and
    history unchanged until ``save_state``)."""
    import ray.data as rd

    from gruut_ray.pipelines.dedup import exact_dedup

    bloom, meta = load_state(state_dir)
    first_run = bloom is None
    if first_run:
        if n_items_hint is None:
            raise ValueError(
                "first run needs n_items_hint (size for the CUMULATIVE "
                "corpus across all planned increments)")
        bloom = BloomFilter.sized_for(n_items_hint, fp_rate)
        meta = {"runs": 0, "items": 0, "fp_rate_target": fp_rate,
                "n_bits": bloom.n_bits, "n_hashes": bloom.n_hashes}

    n_in = ds.count()
    fresh = ds if first_run else filter_new(ds, bloom, col)
    if not first_run:
        # The probe can empty out blocks (or the whole increment): merge
        # away schema-less empties before the dedup join, and guard the
        # all-dropped case — Ray 2.49 hash joins fail on schema-less
        # empty blocks.  The guard pass re-runs only the cheap probe map.
        fresh = fresh.repartition(8)
        if fresh.count() == 0:
            meta = dict(meta)
            meta["runs"] = int(meta.get("runs", 0)) + 1
            meta["fp_estimate"] = bloom.estimated_fp_rate()
            save_state(state_dir, bloom, meta)
            return {"rows_in": n_in, "rows_kept": 0, "rows_dropped": n_in,
                    "run": meta["runs"], "items_total": meta.get("items", 0),
                    "fp_estimate": meta["fp_estimate"],
                    "rebuild_recommended": meta.get("rebuild_recommended",
                                                    False)}
    if within_run:
        fresh = exact_dedup(fresh, text_col=col, id_col=id_col)

    os.makedirs(out_dir, exist_ok=True)
    fresh.write_parquet(out_dir)

    # Fold survivors into history from the written files: one streaming
    # pass, and the state update is derived from exactly what was
    # persisted (no lost-update window between "kept" and "recorded").
    written = rd.read_parquet(out_dir, columns=[col])
    bloom = build_bloom(written, col, extend=bloom)
    n_kept = written.count()

    meta = dict(meta)
    meta["runs"] = int(meta.get("runs", 0)) + 1
    meta["items"] = int(meta.get("items", 0)) + n_kept
    fp_now = bloom.estimated_fp_rate()
    meta["fp_estimate"] = fp_now
    meta["rebuild_recommended"] = bool(
        fp_now > 3 * float(meta.get("fp_rate_target", fp_rate)))
    save_state(state_dir, bloom, meta)

    return {"rows_in": n_in, "rows_kept": n_kept,
            "rows_dropped": n_in - n_kept, "run": meta["runs"],
            "items_total": meta["items"], "fp_estimate": fp_now,
            "rebuild_recommended": meta["rebuild_recommended"]}
