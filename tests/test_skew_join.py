"""skew_aware_join: output identity vs a plain join under planted skew."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _skewed_tables(n_left=5000, n_keys=300, seed=5):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n_left)
    keys[: n_left * 2 // 5] = 7  # one 40%-hot key
    left = pd.DataFrame({"lk": keys.astype("int64"),
                         "lval": np.arange(n_left, dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(n_keys, dtype="int64"),
                          "rval": (np.arange(n_keys) * 3).astype("int64")})
    return left, right


def _canon(df):
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns))
            .reset_index(drop=True))


def test_skew_join_matches_pandas_merge(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import skew_aware_join

    left, right = _skewed_tables()
    expected = _canon(left.merge(right, left_on="lk", right_on="rk")
                      .drop(columns=["rk"]))

    out = skew_aware_join(ray.data.from_pandas(left).repartition(8),
                          ray.data.from_pandas(right).repartition(4),
                          on="lk", right_on="rk",
                          hot_fraction=0.2)  # only key 7 qualifies
    got = _canon(out.to_pandas())
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_skew_join_fallback_no_hot_keys(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import skew_aware_join

    left, right = _skewed_tables()
    expected = _canon(left.merge(right, left_on="lk", right_on="rk")
                      .drop(columns=["rk"]))
    # hot_fraction above every key's share → plain-hash-join fallback
    out = skew_aware_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right),
                          on="lk", right_on="rk", hot_fraction=0.9)
    pd.testing.assert_frame_equal(_canon(out.to_pandas()), expected,
                                  check_dtype=False)


def test_skew_join_string_keys(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import skew_aware_join

    left, right = _skewed_tables(n_left=2000)
    left["lk"] = "k" + left["lk"].astype(str)
    right["rk"] = "k" + right["rk"].astype(str)
    expected = _canon(left.merge(right, left_on="lk", right_on="rk")
                      .drop(columns=["rk"]))
    out = skew_aware_join(ray.data.from_pandas(left).repartition(5),
                          ray.data.from_pandas(right),
                          on="lk", right_on="rk", hot_fraction=0.2)
    pd.testing.assert_frame_equal(_canon(out.to_pandas()), expected,
                                  check_dtype=False)


def test_skew_join_float_key_falls_back(ray_session):
    """Non-int/non-string keys can't round-trip the MG sketch — the
    operator must take the plain join, not crash."""
    import ray.data

    from gruut_ray.pipelines.relational import skew_aware_join

    left, right = _skewed_tables(n_left=500)
    left["lk"] = left["lk"].astype("float64")
    right["rk"] = right["rk"].astype("float64")
    expected = _canon(left.merge(right, left_on="lk", right_on="rk")
                      .drop(columns=["rk"]))
    out = skew_aware_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right),
                          on="lk", right_on="rk", hot_fraction=0.2)
    pd.testing.assert_frame_equal(_canon(out.to_pandas()), expected,
                                  check_dtype=False)
