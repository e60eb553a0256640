"""Synthetic CC-page source + html→text extraction.

The per-row invariant from BASELINE.json input_hint: ``extract_text(html)
== text`` byte-identically for every url; generation is deterministic in
(seed, row id) and independent of batching.
"""

import pyarrow as pa

from gruut_ray.sources.synth import (
    build_html,
    lang_for_row,
    make_batch_for_ids,
    make_text,
    synth_dataset,
)
from gruut_ray.stages.extract import extract_batch, extract_text


def test_extract_inverts_build_html():
    for text in ["Hello world.", "Par one.\n\nPar two.",
                 "Ünïcode & <entities> 'quotes'", ""]:
        html = build_html(text, title="T")
        assert extract_text(html) == text


def test_invariant_over_many_rows():
    out = make_batch_for_ids(list(range(3000)))
    for html, text in zip(out["html"], out["text"]):
        assert extract_text(html) == text


def test_generation_batch_invariant():
    # same ids in different batch splits → identical rows
    whole = make_batch_for_ids(list(range(100)))
    parts = make_batch_for_ids(list(range(50)))
    assert list(whole["url"][:50]) == list(parts["url"])
    assert list(whole["text"][:50]) == list(parts["text"])
    # order independence
    rev = make_batch_for_ids(list(reversed(range(100))))
    assert list(rev["text"]) == list(reversed(whole["text"]))


def test_language_mix_skewed_to_en():
    langs = [lang_for_row(i) for i in range(2000)]
    en_share = langs.count("en-us") / len(langs)
    assert 0.3 < en_share < 0.5
    assert len(set(langs)) == 6


def test_junk_fraction_present():
    texts = [make_text(i, lang_for_row(i)) for i in range(1000)]
    short = sum(1 for t in texts if len(t) <= 40)
    assert 20 <= short <= 80  # ~4% too-short junk docs


def test_extract_batch_drops_html():
    out = make_batch_for_ids(list(range(8)))
    batch = pa.table({
        "url": pa.array(out["url"]),
        "html": pa.array(list(out["html"]), type=pa.binary()),
        "text": pa.array(list(out["text"]), type=pa.large_string()),
    })
    truth = batch.column("text").to_pylist()
    extracted = extract_batch(batch.drop_columns(["text"]), html_col="html")
    assert "html" not in extracted.column_names
    assert extracted.column("text").to_pylist() == truth


def test_synth_dataset_streams_and_invariant_holds(ray_session):
    ds = synth_dataset(512, parallelism=4)
    checked = extract_batch_count = 0

    def verify(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        htmls = batch.column("html").to_pylist()
        ok = [extract_text(h) == t for h, t in zip(htmls, texts)]
        return pa.table({"ok": pa.array(ok, type=pa.bool_())})

    res = ds.map_batches(verify, batch_format="pyarrow").sum("ok")
    assert res == 512


def test_wide_html_rows_stay_block_bounded(ray_session):
    """SURVEY §4 wide rows / VERDICT r03 #6: multi-MB html rows must not
    coalesce into multi-GB extract batches.  The extract stages use
    batch_size=None (one batch per block), so the per-task working set
    is bounded by Ray's dynamic block splitting, not by row count.
    24 × ~2 MB pages (~50 MB total) run the full cc_end_to_end
    composition at 4 cpus (sized so the per-doc scrub cost keeps the
    test under a minute; the batching bound is size-independent); per-batch byte size is asserted against the
    context's target block size."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from gruut_ray.pipelines.quality_filter import cc_end_to_end
    from gruut_ray.sources.synth import build_html
    from gruut_ray.stages.extract import extract_text

    n_rows, mb = 24, 2
    base = ray.data.range(n_rows, override_num_blocks=6)

    def gen(batch):
        ids = batch["id"]
        sent = "the quick brown fox jumps over the lazy dog again. "
        texts = [(f"doc {int(i)} " + sent * (mb * 1_000_000 // len(sent)))
                 for i in ids]
        htmls = [build_html(t, f"t{int(i)}") for i, t in zip(ids, texts)]
        return pa.table({
            "url": pa.array([f"https://wide{int(i) % 7}.example/p/{int(i)}"
                             for i in ids], type=pa.string()),
            "warc_ts": pa.array(
                np.full(len(ids), np.datetime64("2024-01-01", "us"))),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(["en"] * len(ids), type=pa.string()),
        })

    pages = base.map_batches(gen, batch_format="numpy", batch_size=None)

    # direct per-batch bound check on the extract stage's batching mode:
    # one batch per block, block bytes ≤ target + one row of slack
    target = ray.data.DataContext.get_current().target_max_block_size
    max_row = (mb + 1) * 1_000_000

    def measure(batch: pa.Table) -> pa.Table:
        assert batch.nbytes <= target + max_row, batch.nbytes
        ok = all(extract_text(h) == t
                 for h, t in zip(batch.column("html").to_pylist(),
                                 batch.column("text").to_pylist()))
        return pa.table({
            "rows": pa.array([batch.num_rows], type=pa.int64()),
            "bytes": pa.array([batch.nbytes], type=pa.int64()),
            "ok": pa.array([int(ok)], type=pa.int64()),
        })

    stats = pages.map_batches(measure, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    assert stats["rows"].sum() == n_rows
    assert stats["ok"].sum() == len(stats)
    assert stats["bytes"].max() <= target + max_row

    # and the composed pipeline completes under the same bound (8 rows:
    # the per-doc scrub cost on multi-MB texts dominates test wall time,
    # and the batching bound it exercises is row-count independent)
    small = ray.data.range(8, override_num_blocks=4) \
        .map_batches(gen, batch_format="numpy", batch_size=None)
    out = cc_end_to_end(small, n_pages=8, use_ppl=False,
                        quality_concurrency=(1, 2), batch_size=64)
    assert int(out["n_pages"].iloc[0]) == 8
