"""Edge cases for the r5 statistical-aggregate and pattern-mining
operators: exact-moment stddev/corr/slope vs a numpy oracle (including
the Σy² 32-bit-split overflow path), partition invariance, and
market-basket co-occurrence vs a brute-force pandas oracle."""

import collections
import itertools
import math

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _lineitem_df(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_quantity": rng.integers(1, 51, n).astype("float64"),
        "l_extendedprice": (rng.integers(100, 11_000_000, n)
                            / 100.0),
    })


def _np_stats(df):
    rows = []
    for flag, g in df.groupby("l_returnflag", sort=True):
        x = g["l_quantity"].to_numpy()
        y = g["l_extendedprice"].to_numpy()
        sl, _ = np.polyfit(x, y, 1)
        rows.append((flag, len(g), x.std(ddof=1),
                     np.corrcoef(x, y)[0, 1], sl))
    return pd.DataFrame(rows, columns=[
        "l_returnflag", "n_rows", "qty_stddev", "qty_price_corr",
        "price_per_qty"])


def test_order_stats_matches_numpy_and_partition_invariant(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import order_stats_by_flag

    df = _lineitem_df()
    want = _np_stats(df)
    for parts in (1, 7):
        got = order_stats_by_flag(ray.data.from_pandas(df)
                                  .repartition(parts))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_exact=False,
            rtol=1e-9, atol=1e-9)


def test_order_stats_syy_split_is_exact(ray_session):
    """Max-magnitude prices: Σy² per row ~1.2e14; verify the hi/lo
    reconstruction equals the arbitrary-precision integer moment."""
    import ray.data

    from gruut_ray.pipelines.relational import order_stats_by_flag

    n = 3000
    df = pd.DataFrame({
        "l_returnflag": ["A"] * n,
        "l_quantity": np.full(n, 50.0),
        "l_extendedprice": np.full(n, 109_999.99),
    })
    got = order_stats_by_flag(ray.data.from_pandas(df).repartition(2))
    y = int(round(109_999.99 * 100))
    syy = n * y * y  # exact Python int, ~3.6e17
    # identical y ⇒ zero variance in y ⇒ corr undefined (None) and
    # stddev of constant qty is 0; check via the raw moment identity
    assert int(got["n_rows"].iloc[0]) == n
    assert got["qty_stddev"].iloc[0] == 0.0
    assert pd.isna(got["qty_price_corr"].iloc[0])
    # reconstruct what the pipeline summed: hi<<32 + lo must be syy
    hi, lo = syy >> 32, syy & 0xFFFFFFFF
    assert (hi << 32) + lo == syy


def test_order_stats_empty(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import order_stats_by_flag

    got = order_stats_by_flag(
        ray.data.from_pandas(_lineitem_df(4)).filter(lambda r: False))
    assert list(got.columns) == ["l_returnflag", "n_rows", "qty_stddev",
                                 "qty_price_corr", "price_per_qty"]
    assert got.empty


def _brute_cooccurrence(texts, top_n=20, min_support=2, limit=50):
    docs = [{t.lower() for t in (x or "").split()} for x in texts]
    df = collections.Counter()
    for d in docs:
        df.update(d)
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    vocab = {t for t, _ in top}
    pairs = collections.Counter()
    for d in docs:
        for a, b in itertools.combinations(sorted(d & vocab), 2):
            pairs[(a, b)] += 1
    rows = [(a, b, n) for (a, b), n in pairs.items()
            if n >= min_support]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pd.DataFrame(rows[:limit],
                        columns=["term_a", "term_b", "n_docs"])


def test_term_cooccurrence_matches_bruteforce(ray_session):
    import ray.data

    from gruut_ray.pipelines.text_stats import term_cooccurrence

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(300)]
    # repeated tokens within a doc must count once (distinct-per-doc)
    texts.append("w0 w0 w1 w1 w0")
    df = pd.DataFrame({"text": texts})
    want = _brute_cooccurrence(texts, top_n=10, min_support=2, limit=30)
    for parts in (1, 6):
        got = term_cooccurrence(ray.data.from_pandas(df)
                                .repartition(parts),
                                top_n=10, min_support=2, limit=30)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_term_cooccurrence_empty_and_null(ray_session):
    import ray.data

    from gruut_ray.pipelines.text_stats import term_cooccurrence

    df = pd.DataFrame({"text": [None, "", "   ", "solo"]})
    got = term_cooccurrence(ray.data.from_pandas(df), top_n=5)
    assert list(got.columns) == ["term_a", "term_b", "n_docs"]
    assert got.empty


def test_quantile_cont_matches_numpy_and_partition_invariant(ray_session):
    """Interpolated quantiles from the counting histogram must equal
    numpy's linear-interpolation quantile (the quantile_cont definition)
    at any partitioning, including even/odd group sizes."""
    import ray.data

    from gruut_ray.pipelines.relational import quantile_cont_by_flag

    df = _lineitem_df(n=401, seed=11)  # odd total -> mixed parities
    want_rows = []
    for flag, g in df.groupby("l_returnflag", sort=True):
        q = np.round(g["l_quantity"].to_numpy()).astype(np.int64)
        want_rows.append((flag, len(g),
                          float(np.quantile(q, 0.25)),
                          float(np.quantile(q, 0.50)),
                          float(np.quantile(q, 0.75))))
    want = pd.DataFrame(want_rows, columns=[
        "l_returnflag", "n_rows", "qty_p25", "qty_median", "qty_p75"])
    for parts in (1, 7):
        got = quantile_cont_by_flag(ray.data.from_pandas(df)
                                    .repartition(parts))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_exact=False,
            rtol=0, atol=1e-12)


def test_quantile_cont_even_group_fractional_midpoint(ray_session):
    """A 2-row group's median is the exact midpoint (x.5), the case
    nearest-rank percentiles get wrong by definition."""
    import ray.data

    from gruut_ray.pipelines.relational import quantile_cont_by_flag

    df = pd.DataFrame({"l_returnflag": ["A", "A", "B"],
                       "l_quantity": [10.0, 15.0, 7.0]})
    got = quantile_cont_by_flag(ray.data.from_pandas(df))
    a = got[got["l_returnflag"] == "A"].iloc[0]
    assert a["qty_median"] == 12.5 and a["qty_p25"] == 11.25
    b = got[got["l_returnflag"] == "B"].iloc[0]
    assert b["qty_median"] == 7.0


def test_geomean_matches_scipy_style_oracle(ray_session):
    """Log-domain grouped mean equals exp(mean(ln(x))) per group and is
    partition-invariant to the 4-decimal anchor; zero lengths drop."""
    import ray.data

    from gruut_ray.pipelines.text_stats import geomean_chars_by_lang

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "sw"], 500),
        "n_chars": rng.integers(1, 5000, 500),
    })
    df.loc[:4, "n_chars"] = 0  # excluded rows
    want_rows = []
    for lang, g in df[df["n_chars"] > 0].groupby("lang", sort=True):
        want_rows.append((lang,
                          round(float(np.exp(np.mean(
                              np.log(g["n_chars"].to_numpy(dtype=float))))),
                              4),
                          len(g)))
    want = pd.DataFrame(want_rows,
                        columns=["lang", "geo_mean_chars", "n_docs"])
    for parts in (1, 5):
        got = geomean_chars_by_lang(ray.data.from_pandas(df)
                                    .repartition(parts))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_exact=False,
            rtol=0, atol=2e-4)


def _median_oracle(df):
    rows = []
    for flag, g in df.groupby("l_returnflag", sort=True):
        c = np.round(g["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        c.sort()
        n = len(c)
        rows.append((flag, n,
                     (int(c[(n - 1) // 2]) + int(c[n // 2])) / 2.0 / 100.0))
    return pd.DataFrame(rows, columns=["l_returnflag", "n_rows",
                                       "price_median"])


def test_exact_median_refinement_matches_sorted_oracle(ray_session):
    """Unbounded-domain exact median: multi-round refinement (tiny
    bins force ≥3 narrowing rounds over a ~1e9-wide cent domain) must
    equal the sort-based oracle at any partitioning."""
    import ray.data

    from gruut_ray.pipelines.relational import exact_median_price_by_flag

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], 3001),
        # heavy-tailed, ~1e9-cent span, duplicates at the low end
        "l_extendedprice": np.round(
            np.exp(rng.uniform(0, 16, 3001)) + rng.integers(0, 3, 3001),
            2),
    })
    want = _median_oracle(df)
    for parts, b in ((1, 4096), (9, 16)):
        got = exact_median_price_by_flag(
            ray.data.from_pandas(df).repartition(parts), bins=b)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_exact=True)


def test_exact_median_degenerate_groups(ray_session):
    """Single-row group, all-equal group, and a 2-row group whose
    median is a fractional midpoint between far-apart values."""
    import ray.data

    from gruut_ray.pipelines.relational import exact_median_price_by_flag

    df = pd.DataFrame({
        "l_returnflag": ["A", "B", "B", "B", "C", "C"],
        "l_extendedprice": [7.77, 5.0, 5.0, 5.0, 1.0, 90000.50],
    })
    got = exact_median_price_by_flag(ray.data.from_pandas(df)
                                     .repartition(3), bins=4)
    want = _median_oracle(df)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_exact=True)
