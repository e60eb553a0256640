"""HyperLogLog sketch: accuracy bounds, exact merge determinism, and
the grouped Ray pipeline vs exact count-distinct."""

import numpy as np
import pandas as pd
import pytest

from gruut_ray.pipelines.sketches import (
    _splitmix64,
    approx_distinct,
    approx_distinct_by_group,
    hll_estimate,
    hll_registers,
)


@pytest.mark.parametrize("true_n", [50, 1_000, 40_000, 500_000])
def test_hll_accuracy_bounds(true_n):
    """Error stays within ~4 standard errors (1.04/sqrt(m)) across the
    linear-counting and raw-estimator regimes."""
    h = _splitmix64(np.arange(true_n, dtype=np.int64).view(np.uint64))
    est = hll_estimate(hll_registers(h, 12))
    se = 1.04 / np.sqrt(4096)
    assert abs(est - true_n) / true_n < 4 * se, (true_n, est)


def test_hll_merge_is_exact_max():
    """Register merge (elementwise max) equals hashing the union — the
    property that makes any partitioning produce identical output."""
    a = _splitmix64(np.arange(0, 30_000, dtype=np.int64).view(np.uint64))
    b = _splitmix64(np.arange(20_000, 60_000,
                              dtype=np.int64).view(np.uint64))
    ra, rb = hll_registers(a, 12), hll_registers(b, 12)
    runion = hll_registers(np.concatenate([a, b]), 12)
    assert np.array_equal(np.maximum(ra, rb), runion)


def test_approx_distinct_matches_exact_and_block_invariant(ray_session):
    import ray

    rng = np.random.default_rng(21)
    vals = rng.integers(0, 3_000, size=20_000).astype("int64")
    exact = len(set(vals.tolist()))
    df = pd.DataFrame({"user_id": vals})
    ests = [approx_distinct(ray.data.from_pandas(df).repartition(p),
                            "user_id", p=12) for p in (1, 9)]
    assert ests[0] == ests[1]  # merge is exact -> partition-invariant
    assert abs(ests[0] - exact) / exact < 0.07


def test_approx_distinct_by_group_vs_exact(ray_session):
    import ray

    rng = np.random.default_rng(22)
    n = 30_000
    df = pd.DataFrame({
        "day": rng.integers(0, 5, size=n).astype("int64"),
        "user_id": rng.integers(0, 2_000, size=n).astype("int64"),
    })
    out = approx_distinct_by_group(
        ray.data.from_pandas(df).repartition(8),
        group_col="day", value_col="user_id", p=12).set_index("day")
    exact = df.groupby("day")["user_id"].nunique()
    for day, ex in exact.items():
        got = out.loc[day, "approx_distinct"]
        assert abs(got - ex) / ex < 0.07, (day, got, ex)


def test_string_column_hashing(ray_session):
    import ray

    df = pd.DataFrame({"s": [f"user-{i % 500}" for i in range(4_000)]})
    est = approx_distinct(ray.data.from_pandas(df), "s", p=12)
    assert abs(est - 500) / 500 < 0.07


def test_heavy_hitters_guarantee_and_bounds(ray_session):
    """Misra-Gries invariants: every item with true freq > n/(k+1) is
    present, and true counts lie within [min_count, max_count]."""
    import collections

    import ray

    from gruut_ray.pipelines.sketches import heavy_hitters

    rng = np.random.default_rng(31)
    # zipf-ish: a few hot items over a long uniform tail
    hot = [f"hot{i}" for i in range(5)]
    vals = (hot * 2000
            + [f"tail{i}" for i in rng.integers(0, 50_000, size=30_000)])
    rng.shuffle(vals)
    true = collections.Counter(vals)
    n = len(vals)
    k = 20
    df = pd.DataFrame({"v": vals})
    out = heavy_hitters(ray.data.from_pandas(df).repartition(6),
                        "v", k=k).set_index("item")
    for item, c in true.items():
        if c > n / (k + 1):
            assert item in out.index, item
    for item in out.index:
        assert out.loc[item, "min_count"] <= true[item], item
        assert true[item] <= out.loc[item, "max_count"], item
    # the hot items must rank on top
    assert set(hot) <= set(out.index[:8])


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    import ray

    from gruut_ray.pipelines.sketches import (
        BloomFilter,
        build_bloom,
        mark_seen,
    )

    seen_ids = np.arange(0, 20_000, dtype="int64")
    bloom = build_bloom(
        ray.data.from_pandas(pd.DataFrame({"fp": seen_ids}))
        .repartition(5),
        "fp", n_items_hint=20_000, fp_rate=0.01)

    probe_ids = np.arange(10_000, 40_000, dtype="int64")
    out = (mark_seen(
        ray.data.from_pandas(pd.DataFrame({"fp": probe_ids})),
        bloom, "fp").to_pandas().set_index("fp"))
    # no false negatives, ever
    assert out.loc[10_000:19_999, "probably_seen"].all()
    # fp rate among the 20k genuinely-new ids stays near the target
    fp = out.loc[20_000:, "probably_seen"].mean()
    assert fp < 0.03, fp
    # serialization round-trip preserves behavior
    rt = BloomFilter.from_bytes(bloom.to_bytes())
    assert np.array_equal(rt.bits, bloom.bits)
    assert rt.n_bits == bloom.n_bits and rt.n_hashes == bloom.n_hashes


def test_bloom_extend_accumulates_history(ray_session):
    import ray

    from gruut_ray.pipelines.sketches import build_bloom, mark_seen

    day1 = build_bloom(
        ray.data.from_pandas(pd.DataFrame(
            {"fp": np.arange(0, 5_000, dtype="int64")})),
        "fp", n_items_hint=20_000, fp_rate=0.01)
    # extend with day 2: result must contain BOTH days (history union)
    both = build_bloom(
        ray.data.from_pandas(pd.DataFrame(
            {"fp": np.arange(5_000, 10_000, dtype="int64")})),
        "fp", extend=day1)
    assert both.n_bits == day1.n_bits and both.n_hashes == day1.n_hashes
    probe = (mark_seen(
        ray.data.from_pandas(pd.DataFrame(
            {"fp": np.arange(0, 10_000, dtype="int64")})),
        both, "fp").to_pandas())
    assert probe["probably_seen"].all()
    with pytest.raises(ValueError):
        build_bloom(ray.data.range(10), "id")


def test_mg_summarize_basic():
    from gruut_ray.pipelines.sketches import _mg_summarize

    counts = {"a": 10, "b": 7, "c": 1, "d": 1, "e": 2}
    kept = _mg_summarize(dict(counts), 2)
    assert set(kept) == {"a", "b"}
    assert kept["a"] <= 10 and kept["b"] <= 7


def test_bottomk_quantiles_partition_invariant_and_bounded(ray_session):
    """The bottom-k-by-hash sample is identical under any partitioning
    and its quantiles sit near the exact ones."""
    import numpy as np
    import ray.data

    from gruut_ray.pipelines.sketches import bottomk_sample_quantiles

    rng = np.random.default_rng(21)
    vals = np.round(rng.exponential(100.0, size=20_000), 2)
    import pandas as pd
    df = pd.DataFrame({"event_id": np.arange(20_000, dtype="int64"),
                       "value": vals})
    ds = ray.data.from_pandas(df)
    a = bottomk_sample_quantiles(ds, "value", "event_id", k=2000)
    b = bottomk_sample_quantiles(ds.repartition(13), "value",
                                 "event_id", k=2000)
    pd.testing.assert_frame_equal(a, b)
    assert a.loc[0, "n_sample"] == 2000
    for q in (25, 50, 75, 90):
        exact = np.quantile(vals, q / 100, method="inverted_cdf")
        est = a.loc[0, f"p{q:02d}"]
        # rank error O(1/sqrt(k)) → generous value-space tolerance
        assert abs(est - exact) / max(exact, 1.0) < 0.15, (q, est, exact)


def test_bottomk_quantiles_small_input_is_exact(ray_session):
    """k >= n: the 'sample' is the whole column → quantile_disc exact."""
    import numpy as np
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.sketches import bottomk_sample_quantiles

    df = pd.DataFrame({"event_id": np.arange(100, dtype="int64"),
                       "value": np.arange(100, dtype="float64")})
    out = bottomk_sample_quantiles(ray.data.from_pandas(df), "value",
                                   "event_id", k=1000)
    assert out.loc[0, "n_sample"] == 100
    assert out.loc[0, "p50"] == 49.0  # rank ceil(.5*100)-1 = 49
    assert out.loc[0, "p90"] == 89.0


def test_count_min_bounds_and_partition_invariance(ray_session):
    """CMS classic guarantees: never under-counts, over-counts bounded;
    identical result under any partitioning."""
    import collections

    import numpy as np
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.sketches import count_min_estimates

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(500)]
    probs = np.array([1.0 / (i + 1) for i in range(500)])
    probs /= probs.sum()
    docs = [" ".join(rng.choice(vocab, size=40, p=probs))
            for _ in range(400)]
    exact = collections.Counter(w for d in docs for w in d.split())
    n_total = sum(exact.values())
    df = pd.DataFrame({"doc_id": range(400), "text": docs})
    ds = ray.data.from_pandas(df)

    probe = ["w0", "w1", "w10", "w100", "w499", "unseen_term"]
    out = count_min_estimates(ds, probe, depth=4, width=8192)
    assert out.loc[0, "n_total"] == n_total
    eps_bound = int(np.e / 8192 * n_total) + 1
    for _, row in out.iterrows():
        true = exact.get(row["item"], 0)
        assert row["estimate"] >= true               # never undercounts
        assert row["estimate"] <= true + 4 * eps_bound  # generous margin

    out13 = count_min_estimates(ds.repartition(13), probe,
                                depth=4, width=8192)
    pd.testing.assert_frame_equal(out, out13)
