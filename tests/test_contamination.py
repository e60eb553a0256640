"""Benchmark-decontamination operator: known-overlap fixture + block
invariance."""

import pandas as pd
import pytest

from gruut_ray.pipelines.contamination import (
    _gram_hashes,
    contamination_overlap,
)


def test_gram_hashes_basics():
    assert _gram_hashes("one two three four", 5) == set()  # < n words
    g = _gram_hashes("a b c d e f", 5)
    assert len(g) == 2  # "a b c d e", "b c d e f"
    # repeated gram counted once (distinct semantics)
    g2 = _gram_hashes("a b c d e a b c d e a b c d e", 5)
    assert len(_gram_hashes("a b c d e", 5) & g2) == 1


def test_contamination_overlap_known(ray_session):
    import ray

    bench_text = "the quick brown fox jumps over the lazy dog"
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # contains "quick brown fox jumps over" (1 benchmark gram
            # of its 3)
            "a quick brown fox jumps over here now",
            "totally unrelated words with no benchmark overlap at all",
            "",  # no grams
        ],
    })
    bench = pd.DataFrame({"doc_id": [100], "text": [bench_text]})
    for parts in (1, 3):
        out = contamination_overlap(
            ray.data.from_pandas(corpus).repartition(parts),
            ray.data.from_pandas(bench), n=5).set_index("doc_id")
        assert out.loc[1, "n_grams"] == 4
        assert out.loc[1, "n_hit_grams"] == 1
        assert out.loc[2, "n_hit_grams"] == 0
        assert out.loc[3, "n_grams"] == 0
