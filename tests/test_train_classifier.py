"""Distributed quality-classifier distillation (train_classifier.py)."""

import numpy as np
import pyarrow as pa

from gruut_ray.pipelines.train_classifier import (
    distill_quality_classifier, doc_features, score_with_classifier,
    train_quality_classifier)


def test_doc_features_shape_and_determinism():
    a = doc_features("the quick brown fox", "en")
    b = doc_features("the quick brown fox", "en")
    assert a.shape == ((1 << 8) + 8,)
    assert np.array_equal(a, b)
    assert doc_features("", "en")[-1] == 1.0  # bias always on


def test_distill_agreement_on_documents(ray_session):
    import ray.data

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"])
    out = distill_quality_classifier(ds)
    assert int(out["n_docs"][0]) == 500
    # IRLS distillation must recover the teacher's decision well:
    # measured 0.978; 0.93 leaves room for tie drift
    assert int(out["agreement_ppm"][0]) >= 930_000, out


def test_train_separable_synthetic(ray_session):
    """Keeps long wordy docs, drops one-word spam — a separable task
    the student must fit almost perfectly."""
    import ray.data

    texts = []
    langs = []
    for i in range(120):
        if i % 2 == 0:
            texts.append("the data engine builds a fast table scan "
                         "with careful merge logic number %d ok" % i)
        else:
            texts.append(("spam%d " % i) * 80)  # repetition-dropped
        langs.append("en")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(120), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
    })).repartition(4)
    w = train_quality_classifier(ds, iters=6)
    scored = score_with_classifier(ds, w).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pred = scored["pred_keep"].to_numpy()
    want = np.array([i % 2 == 0 for i in range(120)])
    assert (pred == want).mean() >= 0.95


def test_partition_invariant_agreement(ray_session):
    import ray.data

    from gruut_ray.pipelines.train_classifier import HASH_BITS

    ds1 = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"])
    w1 = train_quality_classifier(ds1, iters=4)
    w2 = train_quality_classifier(ds1.repartition(11), iters=4)
    # float tree-reduce order may differ at 1e-12; decisions must agree
    s1 = score_with_classifier(ds1, w1).to_pandas() \
        .sort_values("doc_id")["pred_keep"].to_numpy()
    s2 = score_with_classifier(ds1, w2).to_pandas() \
        .sort_values("doc_id")["pred_keep"].to_numpy()
    assert (s1 == s2).mean() >= 0.99
    assert len(w1) == (1 << HASH_BITS) + 8
