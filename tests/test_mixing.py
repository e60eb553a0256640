"""mixture_sample / pack_sequences (pipelines/mixing.py)."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    srcs = np.array(["a", "b", "c"])[rng.integers(0, 3, size=n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": srcs,
        "n_chars": rng.integers(10, 500, size=n).astype("int64"),
        "text": ["w " * int(k) for k in rng.integers(1, 200, size=n)],
    })


def test_mixture_rates_converge_and_partition_invariant(ray_session):
    import ray.data

    from gruut_ray.pipelines.mixing import mixture_sample

    df = _docs()
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    ds = ray.data.from_pandas(df)
    kept = mixture_sample(ds, rates).to_pandas()
    by_src = kept.groupby("source").size()
    n_a = (df["source"] == "a").sum()
    n_b = (df["source"] == "b").sum()
    assert by_src.get("a", 0) == n_a           # rate 1.0 keeps all
    assert "c" not in by_src.index             # rate 0.0 drops all
    assert abs(by_src["b"] / n_b - 0.5) < 0.05  # ~half survive
    # partition invariance: identical surviving id set
    kept7 = mixture_sample(ds.repartition(7), rates).to_pandas()
    assert set(kept7["doc_id"]) == set(kept["doc_id"])


def test_mixture_default_rate_for_unlisted_sources(ray_session):
    import ray.data

    from gruut_ray.pipelines.mixing import mixture_sample

    df = _docs(300)
    kept = mixture_sample(ray.data.from_pandas(df), {"a": 1.0},
                          default_rate=0.0).to_pandas()
    assert set(kept["source"]) == {"a"}


def test_pack_sequences_invariants(ray_session):
    import ray.data

    from gruut_ray.pipelines.mixing import pack_sequences

    df = _docs(500)
    seq_len = 256
    out = pack_sequences(ray.data.from_pandas(df), seq_len=seq_len)
    assert out.loc[0, "n_docs"] == 500
    total_tokens = sum(len(t.split()) for t in df["text"])
    assert out.loc[0, "total_tokens"] == total_tokens
    n_packs = out.loc[0, "n_packs"]
    # every doc here is < seq_len, so packs never overflow and FFD needs
    # at least ceil(total/seq_len) packs
    assert n_packs >= -(-total_tokens // seq_len)
    # FFD: at most one pack per block is <= half-full → mean fill is
    # comfortably above 0.4 for this workload
    assert out.loc[0, "mean_fill"] > 0.4
