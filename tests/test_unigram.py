"""Unigram-LM tokenizer induction: Viterbi optimality vs brute force,
EM recovery of planted pieces, partition invariance of the summary."""

import itertools
import math

import numpy as np
import pandas as pd
import pytest

from gruut_ray.pipelines.unigram import (unigram_train,
                                         unigram_vocab_summary,
                                         viterbi_encode)

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute_best(word, vocab, max_len=6):
    """Max-probability segmentation by enumerating all cut sets."""
    n = len(word)
    best, best_lp = None, -1e31
    for bits in itertools.product([0, 1], repeat=max(n - 1, 0)):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len or p not in vocab for p in pieces):
            continue
        lp = sum(vocab[p] for p in pieces)
        if lp > best_lp + 1e-12:
            best, best_lp = pieces, lp
    return best, best_lp


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(23)
    vocab_pieces = ["a", "b", "c", "ab", "bc", "abc", "ca", "bca"]
    lps = rng.uniform(-5.0, -0.5, len(vocab_pieces))
    vocab = dict(zip(vocab_pieces, lps))
    for _ in range(40):
        w = "".join(rng.choice(list("abc"), rng.integers(1, 9)))
        got = viterbi_encode(w, vocab)
        want, want_lp = _brute_best(w, vocab)
        assert want is not None
        got_lp = sum(vocab[p] for p in got)
        assert math.isclose(got_lp, want_lp, abs_tol=1e-9)


def test_em_recovers_planted_pieces():
    # Corpus dominated by two multi-char units; EM must keep them and
    # segment with them.
    wc = {"ingest": 100, "digest": 80, "gesture": 60, "in": 40,
          "di": 30, "ure": 20}
    vocab = unigram_train(wc, vocab_size=12)
    assert "gest" in vocab or "ingest" in vocab
    seg = viterbi_encode("ingest", vocab)
    assert len(seg) <= 3


def test_unigram_summary_partition_invariant(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    df = tbl.to_pandas().head(200)
    got1 = unigram_vocab_summary(
        ray.data.from_pandas(df).repartition(1), vocab_size=200)
    got6 = unigram_vocab_summary(
        ray.data.from_pandas(df).repartition(6), vocab_size=200)
    pd.testing.assert_frame_equal(got1, got6)
    assert int(got1["n_unigram_tokens"].iloc[0]) >= \
        int(got1["n_pretokens"].iloc[0])
    assert int(got1["vocab_size"].iloc[0]) <= 210
