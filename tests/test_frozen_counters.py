"""Frozen output counters for the deterministic rows-only queries
(VERDICT r01 #9: shrink the set of unpinned `no_oracle` checks).

Every pipeline here is fully deterministic (seeded RNGs, deterministic
models, deterministic synthetic pages), so exact values are stable
regression pins.  If a rule/model/pack change legitimately shifts one,
update the constant in the SAME commit and say why.
"""

from __future__ import annotations

import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def _pd(result):
    return result.to_pandas() if hasattr(result, "to_pandas") else result


def test_quality_filter_frozen_keep_count(ray_session):
    qf = _pd(QUERIES["quality_filter_documents"](SF_DIR))
    assert len(qf) == 500
    assert int(qf["keep"].sum()) == 480  # rule spec v2


def test_phonemize_frozen_totals(ray_session):
    # n_phonemes counts pack-CRF guesses for OOV words in en/de/es/fr
    # (41249 would mean the packs' G2P models failed to load — the lazy-
    # loading regression caught by code review r02)
    ph = _pd(QUERIES["phonemize_documents"](SF_DIR))
    assert int(ph["n_words"].sum()) == 42248
    assert int(ph["n_phonemes"].sum()) == 93748
    assert int(ph["n_oov"].sum()) == 41442


def test_ann_frozen_neighbors(ray_session):
    lsh = _pd(QUERIES["ann_lsh_top10"](SF_DIR))
    assert lsh["vec_id"].tolist() == [0, 453, 3, 371, 273, 132, 66, 83,
                                      331, 448]
    ivf = _pd(QUERIES["ann_ivf_top10"](SF_DIR))
    assert ivf["vec_id"].tolist() == [0, 225, 12, 347, 402, 299, 232, 497,
                                      71, 248]


def test_embedding_dup_pairs_frozen(ray_session):
    # exact pair-list shape since r3 (oracle-gated): 66 pairs at cosine
    # ≥ 0.4 in sf0.001 (920 at 0.3 is pinned against DuckDB in
    # test_similarity.py::test_embedding_dup_pairs_exact_vs_lsh)
    dup = _pd(QUERIES["embedding_dup_pairs"](SF_DIR))
    assert list(dup.columns) == ["a", "b"]
    assert len(dup) == 66
    assert (dup["a"] < dup["b"]).all()


def test_cc_quality_filter_frozen(ray_session):
    cc = _pd(QUERIES["cc_quality_filter"](SF_DIR))
    got = {r["true_lang"]: (int(r["n_docs"]), int(r["n_kept"]))
           for _, r in cc.iterrows()}
    assert got == {"de": (125, 117), "en": (406, 360), "es": (123, 102),
                   "fr": (108, 94), "ru": (128, 111), "zh": (110, 100)}
