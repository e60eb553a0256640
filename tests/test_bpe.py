"""BPE vocabulary induction (pipelines/bpe.py)."""

import pandas as pd
import pyarrow as pa

from gruut_ray.pipelines.bpe import (END, bpe_encode_stats, bpe_train,
                                     bpe_vocab_summary, encode_word,
                                     learn_bpe)


def test_learn_bpe_classic_example():
    """Sennrich's worked example shape: 'low/lower/newest/widest' —
    frequent suffix 'est</w>' and stem chunks emerge first."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(counts, num_merges=10)
    assert merges, "no merges learned"
    # the most frequent pair is (e, s) from est (9 occurrences)
    assert merges[0] == ("e", "s")
    assert ("es", "t" + END) in merges  # est</w> completes next
    # encoding uses the learned merges deterministically
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert "".join(encode_word("newest", ranks)).replace(END, "") == \
        "newest"


def test_learn_bpe_deterministic_tie_break():
    # all pairs distinct count 2: lexicographic order decides
    merges_a = learn_bpe({"ab": 2, "cd": 2}, num_merges=2)
    merges_b = learn_bpe({"cd": 2, "ab": 2}, num_merges=2)
    assert merges_a == merges_b


def test_encode_word_no_applicable_merges():
    assert encode_word("xyz", {}) == ["x", "y", "z" + END]
    assert encode_word("", {}) == []


def _docs_ds(texts, n_blocks=1):
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def test_bpe_train_partition_invariant(ray_session):
    texts = [f"the cat sat on the mat number {i} again and again"
             for i in range(60)]
    m1 = bpe_train(_docs_ds(texts, n_blocks=1), num_merges=30)
    m2 = bpe_train(_docs_ds(texts, n_blocks=13), num_merges=30)
    assert m1 == m2 and len(m1) > 0


def test_bpe_encode_compresses_training_corpus(ray_session):
    texts = ["the quick brown fox jumps over the lazy dog"] * 40
    ds = _docs_ds(texts, n_blocks=4)
    merges = bpe_train(ds, num_merges=50)
    stats = bpe_encode_stats(ds, merges).to_pandas()
    # with enough merges every repeated word collapses to one token
    assert (stats["n_bpe_tokens"] == stats["n_pretokens"]).all()
    # and with NO merges every word splits to characters
    raw = bpe_encode_stats(ds, []).to_pandas()
    assert (raw["n_bpe_tokens"] > raw["n_pretokens"]).all()


def test_bpe_vocab_summary_shape(ray_session):
    texts = [f"alpha beta gamma delta {i}" for i in range(30)]
    out = bpe_vocab_summary(_docs_ds(texts, n_blocks=3), num_merges=20)
    assert list(out.columns) == ["n_merges", "n_docs", "n_pretokens",
                                 "n_bpe_tokens",
                                 "tokens_per_pretoken_ppm"]
    assert int(out["n_docs"][0]) == 30
    assert int(out["n_bpe_tokens"][0]) <= int(out["n_pretokens"][0]) * 10


def test_max_words_cap_keeps_most_frequent(ray_session):
    from gruut_ray.pipelines.bpe import count_words

    texts = (["common word pair"] * 50) + ["rare%d token" % i
                                           for i in range(40)]
    top = count_words(_docs_ds(texts, n_blocks=5), max_words=5)
    assert len(top) == 5
    assert set(top["word"]).issuperset({"common", "word", "pair"})
    # deterministic order: count desc then word asc
    assert list(top["n"]) == sorted(top["n"], reverse=True)
