"""DSIR importance-resampling selection (pipelines/dsir.py).

Model-driven operator (no SQL oracle): determinism, partition
invariance, the temperature=0 greedy path, and the semantic property
that target-like documents are preferentially selected are pinned here.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(ray_session, n=400, seed=7):
    import ray.data

    rng = np.random.default_rng(seed)
    sports = ["game", "team", "score", "season", "coach", "league",
              "player", "win"]
    law = ["court", "statute", "plaintiff", "appeal", "judge", "filing",
           "motion", "clause"]
    rows = []
    for i in range(n):
        vocab = sports if i % 4 == 0 else law
        words = rng.choice(vocab, size=30)
        rows.append({"doc_id": i, "text": " ".join(words)})
    return ray.data.from_items(rows)


def _target(ray_session, n=40, seed=11):
    import ray.data

    rng = np.random.default_rng(seed)
    sports = ["game", "team", "score", "season", "coach", "league",
              "player", "win"]
    return ray.data.from_items(
        [{"doc_id": 10_000 + i,
          "text": " ".join(rng.choice(sports, size=30))}
         for i in range(n)])


def test_dsir_prefers_target_like_docs(ray_session):
    from gruut_ray.pipelines.dsir import dsir_select

    corpus = _corpus(ray_session)
    target = _target(ray_session)
    picked = dsir_select(corpus, target, n_select=80, temperature=0)
    # sports docs are doc_id % 4 == 0; the sports-trained target model
    # should pull in (almost) only those
    frac_sports = (picked["doc_id"] % 4 == 0).mean()
    assert frac_sports >= 0.95
    assert len(picked) == 80
    # importance weights of picked sports docs are positive
    assert (picked.loc[picked["doc_id"] % 4 == 0, "log_w"] > 0).all()


def test_dsir_deterministic_and_partition_invariant(ray_session):
    from gruut_ray.pipelines.dsir import dsir_select

    corpus = _corpus(ray_session)
    target = _target(ray_session)
    a = dsir_select(corpus, target, n_select=50, seed=3)
    b = dsir_select(corpus.repartition(7), target.repartition(3),
                    n_select=50, seed=3)
    assert a.equals(b)
    # different seed → different Gumbel draw (overwhelmingly likely)
    c = dsir_select(corpus, target, n_select=50, seed=4)
    assert set(a["doc_id"]) != set(c["doc_id"])


def test_dsir_gumbel_softens_greedy(ray_session):
    """temperature>0 resampling still leans target-like but is not the
    pure argmax set."""
    from gruut_ray.pipelines.dsir import dsir_select

    corpus = _corpus(ray_session)
    target = _target(ray_session)
    greedy = dsir_select(corpus, target, n_select=80, temperature=0)
    sampled = dsir_select(corpus, target, n_select=80, temperature=1.0,
                          seed=1)
    assert (sampled["doc_id"] % 4 == 0).mean() >= 0.5
    assert set(sampled["doc_id"]) != set(greedy["doc_id"])


def test_dsir_empty_and_short_docs(ray_session):
    import ray.data

    from gruut_ray.pipelines.dsir import dsir_select

    corpus = ray.data.from_items(
        [{"doc_id": 0, "text": ""},
         {"doc_id": 1, "text": "   "},
         {"doc_id": 2, "text": "court statute judge"},
         {"doc_id": 3, "text": "game team score"}])
    target = ray.data.from_items(
        [{"doc_id": 9, "text": "game team score win"}])
    picked = dsir_select(corpus, target, n_select=2, temperature=0)
    assert picked["doc_id"].tolist() == [0, 3] or \
        3 in picked["doc_id"].tolist()
