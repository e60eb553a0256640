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
