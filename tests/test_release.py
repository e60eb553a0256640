"""Composed training-data release pipeline (pipelines/release.py)."""

import glob
import os

import pyarrow as pa

from gruut_ray.pipelines.release import build_training_shards


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        "text": pa.array([r[0] for r in rows], type=pa.large_string()),
        "lang": pa.array([r[1] for r in rows], type=pa.string()),
        "source": pa.array([r[2] for r in rows], type=pa.string()),
    })).repartition(3)


def _letters(n):
    out = ""
    n += 1
    while n:
        n, r = divmod(n, 26)
        out += chr(97 + r)
    return out


def _distinct_doc(i):
    # every doc's word stream is distinct (letter-coded words — digits
    # would trip the digit-ratio rule), so cross-doc 5-gram overlap is
    # zero and the bench can target exactly one doc
    words = " ".join(f"w{_letters(i)}{_letters(k)}" for k in range(30))
    stops = "the of and with that have to in is was"
    return f"{stops} {words} {stops}"


def test_release_flow_stage_accounting(ray_session, tmp_path):
    rows = []
    for i in range(40):
        rows.append((_distinct_doc(i), "en", "src1"))
    rows.append((_distinct_doc(0), "en", "src1"))         # exact dup
    rows.append(("x " * 80, "en", "src1"))                # repetition drop
    bench_rows = [(_distinct_doc(7), "en", "bench")]      # contaminates #7

    ds = _docs(rows)
    bench = _docs(bench_rows)
    out = str(tmp_path / "shards")
    res = build_training_shards(ds, bench, {"src1": 1.0}, out,
                                max_hit_frac=0.5)
    r = res.iloc[0]
    assert r["n_input"] == 42
    assert r["n_quality_kept"] == 41          # repetition doc dropped
    assert r["n_after_dedup"] == 40           # exact dup removed
    assert r["n_after_decontam"] == 39        # contaminated doc dropped
    assert r["n_after_mixture"] == 39         # rate 1.0 keeps all
    assert r["n_rows_written"] == 39
    assert r["n_shards"] >= 1 and r["n_packs"] >= 1

    # shards are readable and carry exactly the surviving rows
    from gruut_ray.sources.webdataset import read_webdataset_keys

    assert len(read_webdataset_keys(out)) == 39
    assert glob.glob(os.path.join(out, "*.tar"))


def test_release_mixture_thins_sources(ray_session, tmp_path):
    rows = [(_distinct_doc(i), "en", "src%d" % (i % 2))
            for i in range(60)]
    ds = _docs(rows)
    bench = _docs([("completely unrelated benchmark text here that "
                    "shares no five gram with the corpus at all",
                    "en", "b")])
    out = str(tmp_path / "shards")
    res = build_training_shards(ds, bench, {"src0": 1.0, "src1": 0.0},
                                out, default_rate=0.0)
    r = res.iloc[0]
    assert r["n_after_mixture"] == 30  # only src0 survives
    assert r["n_rows_written"] == 30
