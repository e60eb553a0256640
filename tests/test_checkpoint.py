"""Checkpoint/resume: partitioned output + per-partition manifests; a
second run skips completed partitions (SURVEY §4)."""

import glob
import json
import os

import pyarrow.dataset as pads
import pytest

from gruut_ray.state import manifest as mf


def test_manifest_roundtrip(tmp_path):
    out = str(tmp_path / "out")
    mf.write_partition_manifest(out, 3, {"rows": 10, "kept": 8})
    mf.write_partition_manifest(out, 7, {"rows": 5, "kept": 5})
    done = mf.completed_partitions(out)
    assert set(done) == {3, 7}
    assert done[3]["rows"] == 10 and done[3]["part_id"] == 3
    assert "completed_at" in done[7]


def test_manifest_ignores_garbage(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "part=9"))
    with open(os.path.join(out, "part=9", mf.MANIFEST_NAME), "w") as f:
        f.write("{not json")
    assert mf.completed_partitions(out) == {}


@pytest.fixture(scope="module")
def cc_run(ray_session, tmp_path_factory):
    """First full run of the quality filter to partitioned parquet."""
    import ray.data

    from gruut_ray.pipelines.quality_filter import run_to_parquet
    from gruut_ray.sources.synth import synth_dataset

    out_dir = str(tmp_path_factory.mktemp("ckpt") / "out")
    ds = synth_dataset(400, parallelism=4)
    stats = run_to_parquet(ds, out_dir, num_partitions=4, html_col="html",
                           use_ppl=False, quality_concurrency=(1, 2))
    return out_dir, stats


def test_run_writes_all_partitions_and_manifests(cc_run):
    out_dir, stats = cc_run
    assert stats["rows"] == 400
    assert set(stats["partitions"]) == {0, 1, 2, 3}
    for p in range(4):
        pdir = mf.partition_dir(out_dir, p)
        assert glob.glob(os.path.join(pdir, "*.parquet"))
        assert os.path.isfile(os.path.join(pdir, mf.MANIFEST_NAME))
    assert os.path.isfile(os.path.join(out_dir, mf.RUN_MANIFEST_NAME))
    # rows are partitioned by stable url hash: totals add up
    files = glob.glob(os.path.join(out_dir, "part=*", "*.parquet"))
    tbl = pads.dataset(files).to_table()
    assert tbl.num_rows == 400


def test_resume_skips_completed_partitions(cc_run, ray_session):
    out_dir, _ = cc_run
    from gruut_ray.pipelines.quality_filter import run_to_parquet
    from gruut_ray.sources.synth import synth_dataset

    # simulate a crash: partition 2 lost its manifest (incomplete)
    lost = os.path.join(mf.partition_dir(out_dir, 2), mf.MANIFEST_NAME)
    before = mf.completed_partitions(out_dir)
    os.remove(lost)
    for f in glob.glob(os.path.join(mf.partition_dir(out_dir, 2),
                                    "*.parquet")):
        os.remove(f)

    ds = synth_dataset(400, parallelism=4)
    stats = run_to_parquet(ds, out_dir, num_partitions=4, html_col="html",
                           use_ppl=False, quality_concurrency=(1, 2))
    # all four partitions complete again, with identical counters
    after = mf.completed_partitions(out_dir)
    assert set(after) == {0, 1, 2, 3}
    assert after[2]["rows"] == before[2]["rows"]
    assert after[2]["kept"] == before[2]["kept"]
    # completed partitions were NOT rewritten (resume skipped them):
    # their manifests carry the original timestamps
    assert after[0]["completed_at"] == before[0]["completed_at"]
    assert stats["rows"] == 400


def test_resume_cleans_stale_partition_files(cc_run, ray_session):
    """Crash AFTER data write but BEFORE manifest stamping: the partition
    dir holds orphan parquet files.  Resume must clean them — otherwise
    write_parquet appends a second generation and every row doubles."""
    out_dir, _ = cc_run
    from gruut_ray.pipelines.quality_filter import run_to_parquet
    from gruut_ray.sources.synth import synth_dataset

    # simulate: manifest lost, data files left behind
    os.remove(os.path.join(mf.partition_dir(out_dir, 1), mf.MANIFEST_NAME))
    stale = glob.glob(os.path.join(mf.partition_dir(out_dir, 1),
                                   "*.parquet"))
    assert stale  # the orphan generation exists

    ds = synth_dataset(400, parallelism=4)
    run_to_parquet(ds, out_dir, num_partitions=4, html_col="html",
                   use_ppl=False, quality_concurrency=(1, 2))
    files = glob.glob(os.path.join(out_dir, "part=*", "*.parquet"))
    tbl = pads.dataset(files).to_table(columns=["url"])
    assert tbl.num_rows == 400  # no doubled rows
    assert len(set(tbl.column("url").to_pylist())) == 400
