"""Sorted range-partitioned export (sources/sorted_export.py)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gruut_ray.sources.sorted_export import (prune_ranges, sorted_export)


def _events_ds(n=4000, blocks=8):
    import ray.data

    rng = np.random.RandomState(3)
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "value_i": pa.array(rng.randint(0, 100_000, n), type=pa.int64()),
    })).repartition(blocks)


def test_sorted_export_global_order_and_counts(ray_session, tmp_path):
    out = str(tmp_path / "sorted")
    m = sorted_export(_events_ds(), out, col="value_i",
                      id_col="event_id", num_ranges=6)
    assert m["num_rows"] == 4000
    files = sorted(glob.glob(os.path.join(out, "range-*.parquet")))
    assert len(files) == len(m["ranges"])

    # concatenating files in range order is globally sorted
    seen = []
    prev_max = None
    for f in files:
        t = pq.read_table(f)
        v = t.column("value_i").to_numpy()
        assert (v[:-1] <= v[1:]).all()  # sorted within file
        if prev_max is not None:
            assert v[0] >= prev_max  # ranges do not overlap
        prev_max = v[-1]
        seen.append(t)
    total = sum(t.num_rows for t in seen)
    assert total == 4000
    # manifest min/max match file contents
    for r, f in zip(m["ranges"], files):
        t = pq.read_table(f)
        assert int(t.column("value_i").to_numpy().min()) == r["min"]
        assert int(t.column("value_i").to_numpy().max()) == r["max"]


def test_prune_ranges_returns_only_overlapping_files(ray_session,
                                                     tmp_path):
    out = str(tmp_path / "sorted")
    m = sorted_export(_events_ds(), out, col="value_i",
                      id_col="event_id", num_ranges=6)
    lo, hi = 40_000, 45_000
    files = prune_ranges(out, lo, hi)
    assert 0 < len(files) < len(m["ranges"])
    # pruned-in files jointly contain EVERY matching row
    n_pruned = sum(
        int(((t := pq.read_table(f).column("value_i").to_numpy())
             >= lo).astype(int) @ (t <= hi).astype(int))
        for f in files)
    all_files = glob.glob(os.path.join(out, "range-*.parquet"))
    n_all = sum(
        int(((t := pq.read_table(f).column("value_i").to_numpy())
             >= lo).astype(int) @ (t <= hi).astype(int))
        for f in all_files)
    assert n_pruned == n_all > 0


def test_sorted_export_resume_skips_done_ranges(ray_session, tmp_path):
    out = str(tmp_path / "sorted")
    m1 = sorted_export(_events_ds(), out, col="value_i",
                       id_col="event_id", num_ranges=4)
    # delete one range file: the resume pass must rewrite ONLY it
    victim = os.path.join(out, "range-00001.parquet")
    os.remove(victim)
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "range-*.parquet"))}
    m2 = sorted_export(_events_ds(), out, col="value_i",
                       id_col="event_id", num_ranges=4)
    assert m2["num_rows"] == m1["num_rows"]
    assert os.path.exists(victim)
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"untouched range rewritten: {f}"
