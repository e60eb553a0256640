"""Driver-replica correctness harness: run every ``queries()`` entry and
compare with its DuckDB ``oracle_sql()`` (row count + order-insensitive
value comparison with column names sorted), like the driver does at sf0.01.
Runs at sf0.001 here for speed; tolerances on floats."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype("float64").round(4)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = pd.to_datetime(df[col]).astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con, ray_session):
    ray_df = _canonical(_to_pandas(QUERIES[name](SF_DIR)))
    sql_df = _canonical(con.execute(ORACLES[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), (
        f"{name}: rows {len(ray_df)} != {len(sql_df)}")
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, ray_session):
    out = _to_pandas(QUERIES[name](SF_DIR))
    assert len(out) >= 1


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_pandas(out)
    assert len(df) == 500
    assert {"doc_id", "keep", "drop_reason", "lang_id"} <= set(df.columns)


def test_quality_matches_oracle_labels(ray_session):
    """F1 between the Ray pipeline's keep/drop and the single-threaded
    oracle labels must be 1.0 (shared pure scoring; this checks plumbing)."""
    import pyarrow.parquet as pq

    from gruut_ray.oracle import f1_keep_drop, oracle_labels

    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    rows = tbl.to_pylist()
    labels = oracle_labels(rows, text_key="text", id_key="doc_id")

    engine = _to_pandas(QUERIES["quality_filter_documents"](SF_DIR))
    engine_rows = engine.rename(columns={"doc_id": "doc_id"}).to_dict("records")
    f1 = f1_keep_drop(labels, engine_rows, id_key="doc_id")
    assert f1 >= 0.99, f"keep/drop F1 {f1}"
    # exact agreement expected in-sandbox
    eng_by_id = {r["doc_id"]: r for r in engine_rows}
    mismatches = [
        (r["doc_id"], r["keep"], eng_by_id[r["doc_id"]]["keep"])
        for r in labels if eng_by_id[r["doc_id"]]["keep"] != r["keep"]
    ]
    assert not mismatches, mismatches[:5]


def test_revenue_by_segment_broadcast_vs_shuffle(ray_session):
    """The dimension-size cut-over (VERDICT r01 #10): broadcast path and
    shuffle-join path must produce identical output."""
    import ray.data

    from gruut_ray.pipelines.relational import revenue_by_segment

    orders = ray.data.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    customer = ray.data.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    broadcast = revenue_by_segment(orders, customer)
    shuffled = revenue_by_segment(orders, customer, broadcast_limit=1)
    pd.testing.assert_frame_equal(broadcast, shuffled)


def test_sessionize_asof_driver_vs_distributed_paths(ray_session):
    """The driver-limit cut-over (VERDICT r02 #2 rework): the driver path
    and the keyed-repartition per-block path share one kernel and must be
    identical (modulo row order, which callers normalize)."""
    import ray.data

    from gruut_ray.pipelines.relational import asof_last_event, sessionize

    events = ray.data.read_parquet(os.path.join(SF_DIR, "events.parquet"))

    def canon(df, keys):
        return (df.sort_values(keys).reset_index(drop=True)
                [sorted(df.columns)])

    drv = sessionize(events)
    dist = sessionize(events, driver_limit=0)
    keys = ["user_id", "start_ts", "end_ts"]
    pd.testing.assert_frame_equal(canon(drv, keys), canon(dist, keys))

    drv = asof_last_event(events)
    dist = asof_last_event(events, driver_limit=0)
    pd.testing.assert_frame_equal(canon(drv, ["event_id"]),
                                  canon(dist, ["event_id"]))


def test_rolling_window_driver_vs_distributed_paths(ray_session):
    """user_rolling_window's driver cut-over and the keyed-repartition
    per-block path share one kernel and must be identical."""
    import ray.data

    from gruut_ray.pipelines.relational import user_rolling_window

    events = ray.data.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    drv = user_rolling_window(events, window=5)
    dist = user_rolling_window(events, window=5, driver_limit=0)
    pd.testing.assert_frame_equal(drv, dist)


def test_sole_late_supplier_dual_path_identity(ray_session):
    """The Q21-shaped grouped predicate must be output-identical on the
    driver path and the distributed keyed-repartition path (cut-over
    contract, same as event_gap_histogram)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from gruut_ray.pipelines.relational import sole_late_supplier

    sf = "/root/testdata/sf0.001"
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        schema=None)
    o = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    drv = sole_late_supplier(li, o)
    dist = sole_late_supplier(li, o, driver_limit=0)
    pd.testing.assert_frame_equal(drv, dist)


def test_promo_revenue_dual_path_identity(ray_session):
    """VERDICT r04 #1: forcing broadcast_limit=0 must take the hash
    shuffle-join fallback and still return the broadcast path's exact
    result (which is itself driver-oracle-green)."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.relational import promo_revenue_by_type

    sf = "/root/testdata/sf0.001"
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = ray.data.read_parquet(
        f"{sf}/part.parquet", columns=["p_partkey", "p_type"])
    bcast = promo_revenue_by_type(li, part)
    shuf = promo_revenue_by_type(li, part, broadcast_limit=0,
                                 num_partitions=4)
    pd.testing.assert_frame_equal(bcast, shuf)
    assert len(bcast) > 0


def test_product_profit_dual_path_identity(ray_session):
    """VERDICT r04 #1: Q9 shape with both dimensions forced through
    the shuffle-join fallback (broadcast_limit=0) matches the
    broadcast path exactly."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.relational import product_profit

    sf = "/root/testdata/sf0.001"
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    part = ray.data.read_parquet(f"{sf}/part.parquet")
    supplier = ray.data.read_parquet(f"{sf}/supplier.parquet")
    nation = ray.data.read_parquet(f"{sf}/nation.parquet")
    bcast = product_profit(li, orders, part, supplier, nation)
    shuf = product_profit(li, orders, part, supplier, nation,
                          broadcast_limit=0, num_partitions=4)
    pd.testing.assert_frame_equal(bcast, shuf)
    assert len(bcast) > 0


def test_part_supplier_counts_dual_path_identity(ray_session):
    """Q16 shape: the broadcast-dimension path and the forced hash
    shuffle-join path (broadcast_limit=0) count identical distinct
    supplier sets."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.relational import part_supplier_counts

    sf = "/root/testdata/sf0.001"
    li = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])
    part = ray.data.read_parquet(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    supp = ray.data.read_parquet(f"{sf}/supplier.parquet",
                                 columns=["s_suppkey", "s_acctbal"])
    bcast = part_supplier_counts(li, part, supp)
    shuf = part_supplier_counts(li, part, supp, broadcast_limit=0,
                                num_partitions=4)
    pd.testing.assert_frame_equal(bcast, shuf)
    assert len(bcast) > 0


def test_rapid_event_pairs_dual_path_identity(ray_session):
    """Interval self-join: driver path ≡ distributed keyed path."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.relational import rapid_event_pairs

    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["user_id", "ts"])
    drv = rapid_event_pairs(ev)
    dist = rapid_event_pairs(ev, driver_limit=0)
    pd.testing.assert_frame_equal(drv, dist)
    assert int(drv["n_pairs"][0]) > 0


def test_rapid_event_pairs_no_int64_wrap_many_users(ray_session):
    """ADVICE/VERDICT r04: realistic epoch-µs timestamps over a
    year-long span × >290k distinct users in ONE block used to wrap
    ``user_idx * span`` past int64 silently, breaking the sortedness
    searchsorted requires.  Brute-force parity at a scale the old
    offset trick provably corrupted."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from gruut_ray.pipelines.relational import rapid_event_pairs

    rng = np.random.RandomState(3)
    n_users, per_user = 320_000, 3
    base = np.int64(1_770_000_000_000_000)  # ~2026 epoch µs
    year = np.int64(365 * 86_400_000_000)
    uid = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    # per-user bursts: first event uniform over the year, the rest
    # within 0..120 s of it (window 60 s catches about half)
    first = rng.randint(0, year, size=n_users).astype(np.int64)
    offs = rng.randint(0, 120_000_000,
                       size=n_users * per_user).astype(np.int64)
    offs[::per_user] = 0
    ts = base + np.repeat(first, per_user) + offs
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array(uid), "ts": pa.array(ts)})).repartition(1)
    got = rapid_event_pairs(ev, window_s=60)

    # naive O(n·per_user) truth: pairs within one user's sorted burst
    df = pd.DataFrame({"u": uid, "t": ts}).sort_values(["u", "t"])
    t = df["t"].to_numpy()
    w = np.int64(60_000_000)
    expect_pairs = 0
    users_with = 0
    for s in range(0, len(t), per_user):
        seg = t[s:s + per_user]
        lo = np.searchsorted(seg, seg, side="right")
        hi = np.searchsorted(seg, seg + w, side="right")
        c = int((hi - lo).sum())
        expect_pairs += c
        users_with += 1 if c > 0 else 0
    assert int(got["n_pairs"][0]) == expect_pairs
    assert int(got["n_users"][0]) == users_with
    # precondition: the OLD unrebased shift would have wrapped here
    span = np.int64(ts.max() - ts.min()) + w + 1
    assert float(n_users - 1) * float(span) + float(ts.max()) > 2.0**63
