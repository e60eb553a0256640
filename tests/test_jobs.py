"""Submittable job driver (jobs/quality_filter_job.py)."""

import json
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _write_pages(path, n=600):
    from gruut_ray.sources.synth import make_batch_for_ids

    out = make_batch_for_ids(list(range(n)))
    pq.write_table(pa.table({
        "url": pa.array(out["url"], type=pa.string()),
        "warc_ts": pa.array(out["warc_ts"]),
        "html": pa.array(list(out["html"]), type=pa.binary()),
        "text": pa.array(out["text"], type=pa.large_string()),
        "lang": pa.array(out["lang"], type=pa.string()),
    }), path)


def test_quality_filter_job_runs_and_resumes(tmp_path, ray_session,
                                             capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import quality_filter_job as job

    pages = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "out")
    _write_pages(pages)

    assert job.main(["--input", pages, "--output", out,
                     "--num-partitions", "4"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows_in"] == 600 and first["partitions"] == 4
    assert 0 < first["rows_kept"] <= 600

    # second submit resumes: identical totals (lineage-matched manifests)
    assert job.main(["--input", pages, "--output", out,
                     "--num-partitions", "4"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second == first


def test_driver_window_is_fully_oracle_gated():
    """The correctness driver verifies only the first 50 queries()
    entries: every one of those slots must have a DuckDB oracle, and all
    oracled queries must precede all rows-only ones (VERDICT r03 #1)."""
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    names = list(entry.queries().keys())
    oracled = set(entry.oracle_sql().keys())
    assert oracled <= set(names)
    missing = [n for n in names[:50] if n not in oracled]
    assert not missing, f"rows-only entries inside driver window: {missing}"
    positions = [i for i, n in enumerate(names) if n in oracled]
    assert positions == list(range(len(oracled))), \
        "oracled queries must form a contiguous prefix of queries()"


def test_release_job_runs(tmp_path, ray_session, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/jobs")
    import release_job

    # documents parquet: copy a slice of the testdata table
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"])
    docs_path = str(tmp_path / "docs.parquet")
    bench_path = str(tmp_path / "bench.parquet")
    mask = pa.array([i % 100 != 0 for i in
                     src.column("doc_id").to_pylist()])
    pq.write_table(src.filter(mask), docs_path)
    pq.write_table(src.filter(pa.array(
        [not m for m in mask.to_pylist()])), bench_path)

    out = str(tmp_path / "shards")
    assert release_job.main([
        "--input", docs_path, "--bench", bench_path, "--output", out,
        "--rates", '{"src1": 1.0, "src2": 0.5}',
        "--default-rate", "0.8", "--rows-per-shard", "200"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_input"] == src.filter(mask).num_rows
    assert 0 < summary["n_rows_written"] <= summary["n_input"]
    assert summary["n_shards"] >= 1
    from gruut_ray.sources.webdataset import read_webdataset_keys

    assert len(read_webdataset_keys(out)) == summary["n_rows_written"]
