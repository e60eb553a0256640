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
