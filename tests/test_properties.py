"""Property tests: batch-size invariance, determinism, salted-aggregate
equivalence, nested-schema parquet round-trip (SURVEY §5 engine test
plan items b/c)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gruut_ray.nlp.normalize import process_document
from gruut_ray.stages.quality import QualityScrubStage

TEXTS = [
    "Dr. Smith paid $1,234.56 on 1/4/1999 at 4:01pm!",
    "A short one.",
    "Numbers 1 2 3 and a date 3/15/2020 mixed in, twice. Numbers again!",
    "#$% @!^ symbols " * 10,
    "word " * 80,
    "Contact a.b@example.com or +1 555-123-4567 now.",
] * 4


def test_process_document_deterministic():
    a = process_document(TEXTS[0], "en")
    b = process_document(TEXTS[0], "en")
    assert [(w.text, w.text_with_ws, tuple(w.phonemes or ()))
            for s in a for w in s.words] == \
           [(w.text, w.text_with_ws, tuple(w.phonemes or ()))
            for s in b for w in s.words]


def _run_stage_batched(texts, batch_size):
    stage = QualityScrubStage(langid=True, use_ppl=True)
    outs = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i:i + batch_size]
        batch = pa.table({
            "doc_id": pa.array(range(i, i + len(chunk)), type=pa.int64()),
            "text": pa.array(chunk, type=pa.string()),
        })
        outs.append(stage(batch))
    tbl = pa.concat_tables(outs)
    return tbl.sort_by("doc_id").to_pydict()


@pytest.mark.parametrize("batch_size", [1, 3, 7, 24])
def test_quality_stage_batch_size_invariant(batch_size):
    base = _run_stage_batched(TEXTS, 24)
    other = _run_stage_batched(TEXTS, batch_size)
    for col in ("keep", "drop_reason", "n_tokens", "scrubbed_text",
                "lang_id", "n_pii_hits"):
        assert base[col] == other[col], col


def test_salted_aggregate_matches_plain(ray_session):
    import ray.data
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import salted_aggregate

    # heavily skewed key distribution
    rows = [("en", i % 7) for i in range(500)] + \
           [("de", i % 5) for i in range(60)] + [("zh", 1)] * 3
    tbl = pa.table({
        "lang": pa.array([r[0] for r in rows]),
        "n": pa.array([r[1] for r in rows], type=pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    plain = (ds.groupby("lang").aggregate(Sum("n", alias_name="n"))
             .to_pandas().sort_values("lang").reset_index(drop=True))
    salted = (salted_aggregate(ds, "lang", ["n"], num_salts=8)
              .to_pandas().sort_values("lang").reset_index(drop=True))
    assert plain.equals(salted)


def test_nested_sentences_parquet_roundtrip(ray_session, tmp_path):
    import ray.data

    from gruut_ray.stages.phonemize import phonemize

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(["I read the 2 books. Then I left."] * 6),
        "lang": pa.array(["en"] * 6),
    }))
    out_dir = str(tmp_path / "phonemized")
    phonemize(ds, concurrency=1).write_parquet(out_dir)
    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    assert files
    tbl = pq.read_table(files)
    assert tbl.num_rows == 6
    # nested list<struct<... words: list<struct<...>>>> survives parquet
    sent = tbl.column("sentences")[0].as_py()
    assert sent[0]["words"][1]["text"] == "read"
    assert sent[0]["words"][1]["phonemes"] == ["ɹ", "ɛ", "d"] or \
        sent[0]["words"][1]["phonemes"] == ["ɹ", "i", "d"]


def test_routed_quality_filter_matches_unrouted(ray_session):
    import ray.data

    from gruut_ray.pipelines.quality_filter import (
        quality_filter,
        quality_filter_routed,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    cols = ["doc_id", "keep", "drop_reason", "n_tokens", "scrubbed_text",
            "lang_id"]
    plain = (quality_filter(ds, quality_concurrency=(1, 2))
             .select_columns(cols).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    routed = (quality_filter_routed(ds)
              .select_columns(cols).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert plain.equals(routed)


def test_write_json_sink_nested(ray_session, tmp_path):
    """ds.write_json emits the reference CLI's JSONL shape at corpus scale
    (one JSON object per row, nested sentences intact)."""
    import glob
    import json

    import pyarrow as pa
    import ray.data

    from gruut_ray.stages.phonemize import phonemize

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["I read it.", "Two cats."]),
        "lang": pa.array(["en", "en"]),
    }))
    out_dir = str(tmp_path / "jsonl")
    phonemize(ds, concurrency=1).write_json(out_dir)
    rows = []
    for path in glob.glob(out_dir + "/*.json"):
        with open(path) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    assert len(rows) == 2
    by_id = {r["doc_id"]: r for r in rows}
    words = by_id[1]["sentences"][0]["words"]
    assert [w["text"] for w in words][:3] == ["I", "read", "it"]
    assert words[1]["phonemes"]


def test_partial_then_merge_ray_shrink_path(ray_session):
    """The high-cardinality guard (max_driver_rows) must produce output
    identical to the pure driver merge."""
    import pyarrow as pa
    import ray.data

    from gruut_ray.pipelines.agg_util import partial_then_merge

    rows = [{"k": f"key{i % 50}", "v": i} for i in range(2000)]
    ds = ray.data.from_items(rows)

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("k", as_index=False).agg(
            v_sum=("v", "sum"), v_min=("v", "min"), v_max=("v", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    spec = {"v_sum": "sum", "v_min": "min", "v_max": "max"}
    driver = partial_then_merge(ds, partials, ["k"], spec)
    shrunk = partial_then_merge(ds, partials, ["k"], spec,
                                max_driver_rows=1)
    import pandas as pd
    pd.testing.assert_frame_equal(
        driver, shrunk.astype(driver.dtypes.to_dict()))


def test_partial_then_merge_exact_past_int64(ray_session):
    """exact_int_cols must stay exact past 2**63 (code-review r02: a
    plain pandas merge re-infers int64 and silently wraps)."""
    import pyarrow as pa
    import ray.data

    from gruut_ray.pipelines.agg_util import partial_then_merge

    # one row per block: each int64 BATCH partial fits (the documented
    # per-batch bound); only the cross-batch merge exceeds 2**63
    big = 2 ** 62
    rows = [{"k": "hot", "v": big} for _ in range(6)]
    ds = ray.data.from_items(rows).repartition(6)

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("k", as_index=False).agg(
            v=("v", "sum"), n=("v", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = partial_then_merge(ds, partials, ["k"], {"v": "sum", "n": "sum"},
                             exact_int_cols=["v"])
    assert int(out["v"].iloc[0]) == 6 * big  # 1.5 * 2**64: wraps if int64
    assert int(out["n"].iloc[0]) == 6
