"""Quality-filter unit tests: PII scrub, toxicity, langid, heuristics,
perplexity ordering, fused stage behavior."""

import pandas as pd
import pyarrow as pa

from gruut_ray.quality.heuristics import (
    DEFAULT_THRESHOLDS,
    score_document,
)
from gruut_ray.quality.langid import DEFAULT_LANGS, LangIdModel
from gruut_ray.quality.ngram_lm import PerplexityScorer
from gruut_ray.quality.pii import scrub_text, toxicity_count
from gruut_ray.quality.vocab import seed_text
from gruut_ray.stages.quality import QualityScrubStage


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_scrub_email_phone_ssn_ip():
    text = ("Mail bob.smith+x@site.co.uk or call +1 555-123-4567. "
            "SSN 123-45-6789 from 192.168.1.1.")
    scrubbed, hits = scrub_text(text)
    assert "[EMAIL]" in scrubbed and "[PHONE]" in scrubbed
    assert "[SSN]" in scrubbed and "[IP]" in scrubbed
    assert "bob.smith" not in scrubbed and "123-45-6789" not in scrubbed
    assert hits == 4


def test_scrub_credit_card():
    scrubbed, hits = scrub_text("Card: 4111 1111 1111 1111 thanks")
    assert "[CREDIT_CARD]" in scrubbed
    assert hits == 1


def test_scrub_clean_text_unchanged():
    text = "Nothing sensitive here, just words and the number 42."
    scrubbed, hits = scrub_text(text)
    assert scrubbed == text and hits == 0


def test_toxicity_count():
    assert toxicity_count("You absolute idiot, that is stupid.") == 2
    assert toxicity_count("A perfectly nice sentence.") == 0


# ---------------------------------------------------------------------------
# LangId
# ---------------------------------------------------------------------------

def test_langid_identifies_seed_languages():
    model = LangIdModel(DEFAULT_LANGS)
    samples = {lang: seed_text(lang)[:300] for lang in DEFAULT_LANGS}
    preds, scores = model.predict(list(samples.values()))
    assert list(preds) == list(samples)
    assert all(s > 0.5 for s in scores)


def test_langid_empty_text():
    model = LangIdModel(DEFAULT_LANGS)
    preds, scores = model.predict([""])
    assert len(preds) == 1  # no crash; low-confidence prediction


# ---------------------------------------------------------------------------
# Perplexity
# ---------------------------------------------------------------------------

def test_perplexity_orders_fluent_before_garbage():
    s = PerplexityScorer()
    fluent = s.perplexity(seed_text("en-us")[:500], "en")
    garbage = s.perplexity("xq zv kj qq wv zz xj qk vz jx " * 20, "en")
    assert fluent < garbage


# ---------------------------------------------------------------------------
# Rules / score_document
# ---------------------------------------------------------------------------

GOOD_EN = seed_text("en-us")[:800]


def test_score_document_keeps_good_text():
    rec = score_document(GOOD_EN, "en", th=DEFAULT_THRESHOLDS)
    assert rec["keep"] and rec["drop_reason"] == ""


def test_score_document_drops_short():
    rec = score_document("too short", "en", th=DEFAULT_THRESHOLDS)
    assert not rec["keep"]
    assert "short" in rec["drop_reason"] or "chars" in rec["drop_reason"] \
        or "tokens" in rec["drop_reason"]


def test_score_document_drops_symbol_spam():
    rec = score_document("#$% @!^ &&& " * 30, "en", th=DEFAULT_THRESHOLDS)
    assert not rec["keep"]


def test_score_document_drops_repetition():
    rec = score_document("same word same word " * 50, "en",
                         th=DEFAULT_THRESHOLDS)
    assert not rec["keep"]  # unique-token ratio floor


def test_score_document_scrubs_but_keeps_pii_doc():
    text = GOOD_EN + " Contact me at a.person@example.com for details."
    rec = score_document(text, "en", th=DEFAULT_THRESHOLDS)
    assert rec["keep"]
    assert rec["n_pii_hits"] == 1
    assert "[EMAIL]" in rec["scrubbed_text"]
    assert "a.person@example.com" not in rec["scrubbed_text"]


# ---------------------------------------------------------------------------
# Fused stage
# ---------------------------------------------------------------------------

def test_fused_stage_detects_language_and_scores():
    stage = QualityScrubStage(langid=True)
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([seed_text("de-de")[:400], seed_text("en-us")[:400]]),
    })
    out = stage(batch)
    assert out.column("lang_id").to_pylist() == ["de", "en"]
    assert out.column("keep").to_pylist() == [True, True]


def test_stage_poison_document_guard():
    stage = QualityScrubStage(use_ppl=False)
    batch = pa.table({
        "text": pa.array([None], type=pa.string()),
        "lang": pa.array(["en"]),
    })
    out = stage(batch)  # must not raise
    assert out.num_rows == 1
    assert out.column("keep").to_pylist() == [False]


def test_quality_filter_tasks_vs_actors_identical(ray_session):
    """pool="tasks" (worker-process module cache) and pool="actors"
    (actor pool) must produce identical rows — the scorer is
    deterministic; only the execution vehicle differs."""
    import ray.data

    from gruut_ray.pipelines.quality_filter import quality_filter

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def rows(pool):
        out = quality_filter(ds, use_ppl=True, fused=True, pool=pool,
                             quality_concurrency=2).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(rows("actors"), rows("tasks"))


def test_ccnet_buckets_partition_invariant_and_oracle(ray_session):
    import math

    import ray.data

    from gruut_ray.pipelines.quality_filter import ccnet_perplexity_buckets
    from gruut_ray.quality.ngram_lm import PerplexityScorer

    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["lang", "text"])
    df = tbl.to_pandas().head(300)

    got1 = ccnet_perplexity_buckets(
        ray.data.from_pandas(df).repartition(1))
    got7 = ccnet_perplexity_buckets(
        ray.data.from_pandas(df).repartition(7))
    pd.testing.assert_frame_equal(got1, got7)

    # Single-thread oracle: same quantization, same percentile_disc
    # tercile semantics, same rollup.
    scorer = PerplexityScorer()
    ref = df.copy()
    ref["ppl_d"] = [int(round(scorer.perplexity(t or "", lg) * 10))
                    for t, lg in zip(ref["text"], ref["lang"])]
    rows = []
    for lang, grp in ref.groupby("lang", sort=True):
        v = grp["ppl_d"].sort_values().to_numpy()
        n = len(v)
        t1 = v[max(1, math.ceil(n / 3.0)) - 1]
        t2 = v[max(1, math.ceil(2.0 * n / 3.0)) - 1]
        for bucket, mask in (("head", v <= t1),
                             ("middle", (v > t1) & (v <= t2)),
                             ("tail", v > t2)):
            if not mask.any():
                continue
            rows.append((lang, bucket, int(mask.sum()),
                         int(v[mask].sum())))
    want = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs",
                                       "sum_ppl_d"])
    want = want.sort_values(["lang", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, want.astype(
        got1.dtypes.to_dict()))

    # Tercile balance: each lang's head/middle/tail within ties of n/3.
    for lang, grp in got1.groupby("lang"):
        n = grp["n_docs"].sum()
        head = int(grp.loc[grp.bucket == "head", "n_docs"].sum())
        assert head >= math.ceil(n / 3.0) * 0.5
