"""Edge cases for the r5 grouping-set / window / argmin operators:
tie runs straddling ntile boundaries, CUBE grouping-set consistency,
packed-argmin tie-break and overflow guard."""

import math

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute_ntile(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Row-level ntile per DuckDB semantics (first n%k tiles get
    ceil(n/k)) then rolled up — the oracle the histogram path must
    match on ANY tie pattern."""
    rows = []
    for etype, grp in df.groupby("event_type", sort=True):
        g = grp.sort_values(["v_c", "event_id"]).reset_index(drop=True)
        n = len(g)
        base, rem = divmod(n, k)
        start = 0
        for tile in range(1, k + 1):
            size = base + (1 if tile <= rem else 0)
            if size == 0:
                continue
            chunk = g.iloc[start:start + size]
            rows.append((etype, tile, size, int(chunk["v_c"].sum())))
            start += size
    return pd.DataFrame(rows, columns=["event_type", "tile",
                                       "n_rows", "sum_value_c"])


def test_ntile_tie_runs_straddle_boundaries(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import event_value_ntile

    # One value repeated 7x out of 10 rows: its run straddles every
    # tile boundary of ntile(4); a second type exercises n % k != 0.
    rng = np.random.default_rng(11)
    vals = np.concatenate([np.full(7, 3.5), rng.integers(0, 4, 3)])
    df = pd.DataFrame({
        "event_id": np.arange(len(vals), dtype="int64"),
        "event_type": ["a"] * len(vals),
        "value": vals.astype("float64"),
    })
    df2 = pd.DataFrame({
        "event_id": np.arange(100, 111, dtype="int64"),
        "event_type": ["b"] * 11,
        "value": np.full(11, 2.0),
    })
    full = pd.concat([df, df2], ignore_index=True)
    ds = ray.data.from_pandas(full).repartition(3)
    got = event_value_ntile(ds, k=4)

    ref = full.copy()
    ref["v_c"] = (ref["value"] * 100).round().astype("int64")
    want = _brute_ntile(ref, 4)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()))


def test_ntile_random_matches_bruteforce(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import event_value_ntile

    rng = np.random.default_rng(7)
    n = 5000
    full = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "event_type": rng.choice(["x", "y", "z"], n),
        # Small integer domain → massive tie runs.
        "value": rng.integers(0, 9, n).astype("float64") / 2.0,
    })
    ds = ray.data.from_pandas(full).repartition(8)
    for k in (3, 4, 7):
        got = event_value_ntile(ds, k=k)
        ref = full.copy()
        ref["v_c"] = (ref["value"] * 100).round().astype("int64")
        want = _brute_ntile(ref, k)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype(got.dtypes.to_dict()))


def test_cube_grouping_sets_consistent(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import lineitem_cube

    rng = np.random.default_rng(3)
    n = 4000
    full = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["F", "O"], n),
        "l_quantity": rng.integers(1, 51, n).astype("float64"),
    })
    got = lineitem_cube(ray.data.from_pandas(full).repartition(5))

    # 3*2 fine + 3 + 2 + 1 grouping-set rows.
    assert len(got) == 12
    fine = got[(got.l_returnflag != "ALL") & (got.l_linestatus != "ALL")]
    grand = got[(got.l_returnflag == "ALL") & (got.l_linestatus == "ALL")]
    assert int(grand["n_rows"].iloc[0]) == n == int(fine["n_rows"].sum())
    assert int(grand["sum_qty_c"].iloc[0]) == int(fine["sum_qty_c"].sum())
    want_fine = (full.assign(q=(full.l_quantity * 100).round()
                             .astype("int64"))
                 .groupby(["l_returnflag", "l_linestatus"])
                 .agg(n_rows=("q", "size"), sum_qty_c=("q", "sum"))
                 .reset_index())
    merged = fine.merge(want_fine, on=["l_returnflag", "l_linestatus"],
                        suffixes=("", "_w"))
    assert (merged["n_rows"] == merged["n_rows_w"]).all()
    assert (merged["sum_qty_c"] == merged["sum_qty_c_w"]).all()


def test_min_cost_supplier_tiebreak_and_guard(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import min_cost_supplier

    li = pd.DataFrame({
        "l_partkey": [1, 1, 1, 2, 2],
        "l_suppkey": [9, 4, 7, 2, 8],
        # part 1: min price 5.00 shared by suppliers 9 and 4 → 4 wins.
        "l_extendedprice": [5.0, 5.0, 6.0, 3.0, 2.5],
    })
    part = pd.DataFrame({"p_partkey": [1, 2, 3],
                         "p_size": pd.array([15, 15, 9],
                                            dtype="int32")})
    supp = pd.DataFrame({"s_suppkey": [2, 4, 7, 8, 9],
                         "s_name": [f"S{i}" for i in (2, 4, 7, 8, 9)]})
    got = min_cost_supplier(
        ray.data.from_pandas(li).repartition(3),
        ray.data.from_pandas(part),
        ray.data.from_pandas(supp), size=15)
    assert got["p_partkey"].tolist() == [1, 2]
    assert got["min_price_c"].tolist() == [500, 250]
    assert got["s_suppkey"].tolist() == [4, 8]
    assert got["s_name"].tolist() == ["S4", "S8"]

    # Overflow guard: price_c beyond the 2**32 packing headroom raises
    # instead of silently corrupting the argmin.
    li_big = li.copy()
    li_big.loc[0, "l_extendedprice"] = math.ldexp(1.0, 33) / 100 * 101
    with pytest.raises(Exception, match="headroom"):
        min_cost_supplier(
            ray.data.from_pandas(li_big).repartition(1),
            ray.data.from_pandas(part),
            ray.data.from_pandas(supp), size=15)


def test_full_outer_activity_one_side_empty(ray_session):
    import ray.data

    from gruut_ray.pipelines.relational import full_outer_user_activity

    orders = pd.DataFrame({
        "o_custkey": [1, 1, 2],
        "o_orderdate": pd.to_datetime(
            ["1995-02-01", "1995-07-01", "1995-03-15"]),
        "o_totalprice": [10.0, 20.0, 5.5],
    })
    # No 'purchase' events at all → the union's right side contributes
    # zero rows; every key must classify orders_only.
    events = pd.DataFrame({
        "user_id": [1, 3],
        "event_type": ["click", "view"],
        "value": [1.0, 2.0],
    })
    got = full_outer_user_activity(
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(events).repartition(2))
    assert got["side"].tolist() == ["orders_only"]
    assert got["n_users"].tolist() == [2]
    assert got["n_orders"].tolist() == [3]
    assert got["orders_c"].tolist() == [3550]
    assert got["n_events"].tolist() == [0]
    assert got["events_c"].tolist() == [0]

    # And the mirror: no 1995 orders.
    orders2 = orders.assign(o_orderdate=pd.to_datetime(
        ["1994-02-01", "1994-07-01", "1996-03-15"]))
    events2 = events.assign(event_type=["purchase", "purchase"])
    got2 = full_outer_user_activity(
        ray.data.from_pandas(orders2).repartition(2),
        ray.data.from_pandas(events2).repartition(2))
    assert got2["side"].tolist() == ["events_only"]
    assert got2["n_users"].tolist() == [2]
    assert got2["events_c"].tolist() == [300]
