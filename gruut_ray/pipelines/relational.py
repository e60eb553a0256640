"""Relational-style demo pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator surface (filter → project →
partial aggregate → small groupby; broadcast hash join; windowed aggregate)
with the scale patterns this repo standardizes on:

* aggregations pre-combine inside ``map_batches`` so the shuffle moves
  (keys × batches) rows, not documents/lineitems;
* small dimension tables broadcast via ``ray.put`` into batch kernels —
  no shuffle join;
* event-time windows are plain column computations + grouped aggregation
  (Ray Data has no watermarks; the events table is a bounded log).
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if typing.TYPE_CHECKING:
    import ray.data


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """2-decimal money/rate column → exact int64 hundredths.

    TPC-H money columns carry exactly two decimals, so ``round(x*100)`` is
    the stored integer recovered exactly (the float error is ~1e-9 ≪ 0.5).
    All downstream sums are then exact integer arithmetic — deterministic
    and independent of summation order, which is what lets the DuckDB
    oracle hash-match bit-for-bit (CORRECTNESS r01 showed ~1e-6
    order-of-summation noise when summing doubles directly)."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def pricing_summary(lineitem: "ray.data.Dataset",
                    cutoff: str = "1998-09-01") -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary (filter → partial agg → tiny groupby
    → sort).  Money sums are exact fixed-point: per-row integer cents
    (disc_price in 1e-4 dollars, charge in 1e-6 dollars), int64 partials
    per batch, arbitrary-precision merge, one float division at the end."""
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff_ts))
        if batch.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "l_linestatus": pa.array([], pa.string()),
                             "sum_qty": pa.array([], pa.int64()),
                             "sum_base_price": pa.array([], pa.int64()),
                             "sum_disc_price": pa.array([], pa.int64()),
                             "sum_charge": pa.array([], pa.int64()),
                             "count_order": pa.array([], pa.int64())})
        base_c = _cents(batch.column("l_extendedprice"))
        disc_bp = _cents(batch.column("l_discount"))      # basis points /100
        tax_bp = _cents(batch.column("l_tax"))
        # disc_price in 1e-4 $, charge in 1e-6 $ — exact ints, ≤ ~1e11/row
        disc_price = pc.multiply(base_c,
                                 pc.subtract(pa.scalar(100), disc_bp))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(100), tax_bp))
        df = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": _cents(batch.column("l_quantity")),
            "base": base_c,
            "disc": disc_price,
            "charge": charge,
        }).to_pandas()
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_price=("base", "sum"),
            sum_disc_price=("disc", "sum"), sum_charge=("charge", "sum"),
            count_order=("qty", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from gruut_ray.pipelines.agg_util import partial_then_merge

    out = partial_then_merge(
        lineitem, partials, ["l_returnflag", "l_linestatus"],
        {"sum_qty": "sum", "sum_base_price": "sum", "sum_disc_price": "sum",
         "sum_charge": "sum", "count_order": "sum"},
        exact_int_cols=["sum_qty", "sum_base_price", "sum_disc_price",
                        "sum_charge"])
    out["sum_qty"] = (out["sum_qty"] / 100.0).astype("float64")
    out["sum_base_price"] = (out["sum_base_price"] / 100.0).astype("float64")
    out["sum_disc_price"] = (out["sum_disc_price"] / 1e4).astype("float64")
    out["sum_charge"] = (out["sum_charge"] / 1e6).astype("float64")
    return out


def revenue_by_segment(orders: "ray.data.Dataset",
                       customer: "ray.data.Dataset",
                       broadcast_limit: int = 5_000_000) -> pd.DataFrame:
    """Orders ⋈ customer rollup with a size cut-over (VERDICT r01):

    * customer ≤ ``broadcast_limit`` rows — broadcast hash join: the
      dimension is ``ray.put`` once; each orders batch maps
      custkey→segment with a pandas merge, no shuffle;
    * larger — the dimension no longer fits every worker's heap
      (it grows with scale factor), so fall back to the shuffle hash
      join (same plan shape as :func:`revenue_by_priority`).

    Both paths produce identical output (unit-tested)."""
    import ray

    if customer.count() > broadcast_limit:
        return _revenue_by_segment_shuffle(orders, customer)

    cust_df = customer.select_columns(
        ["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(cust_df)

    # plain TASKS with a per-worker-process cache keyed by the broadcast
    # ObjectRef: ray.get + deserialize happens once per worker (exactly
    # the actor-pool amortization) but without pool spin-up or the fixed
    # concurrency cap — tasks scale to every idle core
    def join_seg(batch: pa.Table, _cache={}) -> pa.Table:
        cust = _cache.get(cust_ref)
        if cust is None:
            _cache.clear()  # bound to one table: fresh ref per call site
            cust = _cache[cust_ref] = ray.get(cust_ref)
        cents = _cents(batch.column("o_totalprice"))
        df = pa.table({"o_custkey": batch.column("o_custkey"),
                       "price_c": cents}).to_pandas()
        joined = df.merge(cust, left_on="o_custkey",
                          right_on="c_custkey", how="inner")
        agg = joined.groupby("c_mktsegment", as_index=False).agg(
            revenue_c=("price_c", "sum"),
            n_orders=("price_c", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    partials = orders.map_batches(join_seg,
                                  batch_format="pyarrow").to_pandas()
    return _finish_revenue_by_segment(partials)


def _finish_revenue_by_segment(partials: pd.DataFrame) -> pd.DataFrame:
    grouped = partials.groupby("c_mktsegment", as_index=False)
    out = grouped.agg(n_orders=("n_orders", "sum"))
    # sum PYTHON ints: pandas re-infers int64 from .map(int), which would
    # silently wrap past 2**63 at extreme scale (code-review r02)
    sums = grouped["revenue_c"].apply(lambda s: sum(int(x) for x in s))
    out["revenue"] = (sums["revenue_c"] / 100.0).astype("float64")
    out = out[["c_mktsegment", "revenue", "n_orders"]]
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def _revenue_by_segment_shuffle(orders: "ray.data.Dataset",
                                customer: "ray.data.Dataset",
                                num_partitions: int = 16) -> pd.DataFrame:
    """Large-dimension path: project both sides to join key + needed
    columns, native hash join, per-batch partial rollup."""
    o = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .repartition(num_partitions)
    c = customer.select_columns(["c_custkey", "c_mktsegment"]) \
        .repartition(num_partitions)
    joined = o.join(c, join_type="inner", num_partitions=num_partitions,
                    on=("o_custkey",), right_on=("c_custkey",))

    def partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "c_mktsegment": batch.column("c_mktsegment"),
            "price_c": _cents(batch.column("o_totalprice")),
        }).to_pandas()
        agg = df.groupby("c_mktsegment", as_index=False).agg(
            revenue_c=("price_c", "sum"), n_orders=("price_c", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    parts = joined.map_batches(partials, batch_format="pyarrow").to_pandas()
    return _finish_revenue_by_segment(parts)


def events_hourly_window(events: "ray.data.Dataset") -> pd.DataFrame:
    """Tumbling 1-hour window aggregate per event_type: window assignment is
    a column computation; aggregation is partial-then-grouped."""
    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())  # microseconds
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        df = pa.table({
            "event_type": batch.column("event_type"),
            "window_start": hour,
            "value_c": _cents(batch.column("value")),  # exact fixed-point
            "value": batch.column("value"),
        }).to_pandas()
        agg = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), sum_value=("value_c", "sum"),
            min_value=("value", "min"), max_value=("value", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from gruut_ray.pipelines.agg_util import partial_then_merge

    out = partial_then_merge(
        events, partials, ["event_type", "window_start"],
        {"n": "sum", "sum_value": "sum", "min_value": "min",
         "max_value": "max"},
        exact_int_cols=["sum_value"])
    out["sum_value"] = (out["sum_value"] / 100.0).astype("float64")
    out["window_start"] = pd.to_datetime(
        out["window_start"], unit="us").astype("datetime64[us]")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def sessionize(events: "ray.data.Dataset", gap_minutes: int = 30,
               num_partitions: int = 32,
               driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Session windows per user, per-BLOCK vectorized (VERDICT r02 #2):
    hash-repartition on ``user_id`` co-locates each user's events in one
    block, then ONE pandas kernel per block sorts the block by
    (user_id, ts) and labels sessions for ALL its users at once — a
    user-boundary-aware gap cumsum — instead of one ``map_groups`` UDF
    dispatch per user (at 10^12 events, groups ≈ users and per-group
    dispatch dominates).  Partitioning assumption: one user's events fit
    in one block (same as the per-group version's).

    Size cut-over: below ``driver_limit`` rows the (user_id, ts)
    projection is pulled to the driver and the SAME kernel runs once —
    the keyed repartition spins per-call HashShuffleAggregator actors
    whose fixed startup dominates small inputs.  Output-identical by
    construction (one big block); the distributed path takes over at
    scale."""
    gap_us = gap_minutes * 60 * 1_000_000

    def block_sessions(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = ((uid[1:] != uid[:-1])
                               | ((ts[1:] - ts[:-1]) > gap_us))
        g = g.assign(_session=np.cumsum(new_session))
        agg = g.groupby("_session", sort=False).agg(
            user_id=("user_id", "first"), n_events=("ts", "size"),
            start_ts=("ts", "min"), end_ts=("ts", "max"))
        return agg.reset_index(drop=True)

    slim = events.select_columns(["user_id", "ts"])
    if events.count() <= driver_limit:  # metadata-only on parquet reads
        return block_sessions(slim.to_pandas()).reset_index(drop=True)

    # keyed repartition needs the HASH_SHUFFLE strategy; set it on this
    # dataset chain's own context (a per-dataset copy, not the global)
    # and restore after execution completes inside this function
    from ray.data.context import ShuffleStrategy

    prev = events.context.shuffle_strategy
    events.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        return (slim.repartition(num_partitions, keys=["user_id"])
                .map_batches(block_sessions, batch_format="pandas",
                             batch_size=None)
                .to_pandas())
    finally:
        events.context.shuffle_strategy = prev


def suppliers_by_region(supplier: "ray.data.Dataset",
                        nation: "ray.data.Dataset",
                        region: "ray.data.Dataset"):
    """Two-hop dimension rollup (supplier → nation → region).

    Both dimensions are tiny: compose the nation→region mapping on the
    driver, ``ray.put`` it once, and map-side join inside ``map_batches`` —
    zero shuffle; the only exchange is the per-batch partial rollup
    (SURVEY §2.4 broadcast-small-side rule)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    nat = nation.to_pandas()
    reg = region.to_pandas()
    nat2reg = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(dict(zip(nat2reg["n_nationkey"], nat2reg["r_name"])))

    def partials(batch: pa.Table, _cache={}) -> pa.Table:
        lookup = _cache.get("lookup")
        if lookup is None:  # fetched once per worker process, not per batch
            lookup = _cache["lookup"] = ray.get(lookup_ref)
        df = pa.table({
            "s_suppkey": batch.column("s_suppkey"),
            "s_nationkey": batch.column("s_nationkey"),
            "acctbal_c": _cents(batch.column("s_acctbal")),
        }).to_pandas()
        df["r_name"] = df["s_nationkey"].map(lookup)
        agg = df.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"),
            total_acctbal=("acctbal_c", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(supplier, partials, ["r_name"],
                             {"n_suppliers": "sum", "total_acctbal": "sum"},
                             exact_int_cols=["total_acctbal"])
    out["total_acctbal"] = (out["total_acctbal"] / 100.0).astype("float64")
    return out


def asof_last_event(events: "ray.data.Dataset",
                    left_type: str = "purchase",
                    right_type: str = "click",
                    driver_limit: int = 5_000_000):
    """As-of join within one event stream: for each ``left_type`` event,
    the most recent ``right_type`` event by the same user at or before it
    (classic attribution).  Ray Data has no asof-join primitive, so it is
    composed per SURVEY §2 custom-operator rule (a): filter →
    hash-repartition on the ``by`` key (``user_id``) → ONE vectorized
    ``pandas.merge_asof(by="user_id")`` per BLOCK covering all of that
    block's users at once (VERDICT r02 #2 — the prior per-user
    ``map_groups`` paid one UDF dispatch per user; at 10^12 events,
    groups ≈ users and dispatch dominates).  Partitioning assumption: one
    user's events fit in one block (true for web logs; a user with
    pathological volume would need ts-range sub-splitting).

    Returns a DataFrame (event_id, user_id, last_click_ts) sorted by
    event_id — the shape of the SQL scalar-subquery oracle."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def project(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        pa.array([left_type, right_type]))
        return batch.filter(mask).select(
            ["event_id", "ts", "user_id", "event_type"])

    slim = events.map_batches(project, batch_format="pyarrow")

    def block_asof(df: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=) wants both sides globally ts-sorted; it then
        # matches within each user vectorized — one call per block
        left = (df[df["event_type"] == left_type]
                .sort_values("ts", kind="mergesort"))
        if left.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "last_click_ts": pd.Series(
                                     [], dtype="datetime64[us]")})
        right = (df[df["event_type"] == right_type]
                 .sort_values("ts", kind="mergesort")
                 .rename(columns={"ts": "last_click_ts"}))
        merged = pd.merge_asof(
            left, right[["user_id", "last_click_ts"]],
            left_on="ts", right_on="last_click_ts", by="user_id",
            direction="backward")
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "last_click_ts": merged["last_click_ts"].astype(
                "datetime64[us]"),
        })

    # size cut-over (same rationale as sessionize): below the threshold
    # run the SAME kernel once on the driver — output-identical by
    # construction; the keyed-repartition path takes over at scale
    if events.count() <= driver_limit:  # metadata-only on parquet reads
        out = block_asof(slim.to_pandas())
        return out.sort_values("event_id").reset_index(drop=True)

    from ray.data.context import ShuffleStrategy

    prev = events.context.shuffle_strategy
    events.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        out = (slim.repartition(32, keys=["user_id"])
               .map_batches(block_asof, batch_format="pandas",
                            batch_size=None)
               .to_pandas())
    finally:
        events.context.shuffle_strategy = prev
    return out.sort_values("event_id").reset_index(drop=True)


def revenue_by_priority(orders: "ray.data.Dataset",
                        lineitem: "ray.data.Dataset",
                        num_partitions: int = 16):
    """Large×large SHUFFLE join (orders ⋈ lineitem on orderkey) via the
    native ``Dataset.join`` hash join — the pattern for joins where neither
    side broadcasts.  Inputs are pre-projected to the join key + needed
    columns so the exchange ships minimal bytes; the joined stream is
    partially aggregated per batch before the tiny final groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from gruut_ray.pipelines.agg_util import partial_then_merge

    o = orders.select_columns(["o_orderkey", "o_orderpriority"]) \
        .repartition(num_partitions)
    l = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]) \
        .repartition(num_partitions)
    joined = l.join(o, join_type="inner", num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",))
    return _revenue_priority_agg(joined)


def _revenue_priority_agg(joined: "ray.data.Dataset") -> pd.DataFrame:
    """Shared rollup for :func:`revenue_by_priority` and its skew-aware
    join variant: per-batch exact fixed-point partials → tiny groupby."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        # exact fixed-point: cents × (100 - basis points) = 1e-4 dollars
        revenue = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100), _cents(batch.column("l_discount"))))
        df = pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "revenue": revenue,
        }).to_pandas()
        agg = df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(joined, partials, ["o_orderpriority"],
                             {"revenue": "sum", "n_items": "sum"},
                             exact_int_cols=["revenue"])
    out["revenue"] = (out["revenue"] / 1e4).astype("float64")
    return out


def revenue_by_priority_skew(orders: "ray.data.Dataset",
                             lineitem: "ray.data.Dataset",
                             hot_fraction: float = 5e-5,
                             k: int = 512,
                             num_partitions: int = 16) -> pd.DataFrame:
    """:func:`revenue_by_priority` computed through
    :func:`skew_aware_join` — hot orderkeys join map-side against a
    broadcast slice of orders, the near-uniform remainder hash-joins.
    Same result by construction (the split is performance-only); the
    driver checks it against the identical SQL oracle."""
    o = orders.select_columns(["o_orderkey", "o_orderpriority"])
    l = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = skew_aware_join(l, o, on="l_orderkey",
                             right_on="o_orderkey",
                             hot_fraction=hot_fraction, k=k,
                             num_partitions=num_partitions)
    return _revenue_priority_agg(joined)


def events_sliding_window(events: "ray.data.Dataset",
                          window_hours: int = 3, slide_hours: int = 1):
    """Sliding event-time window (3h window, 1h slide) per event_type:
    each event belongs to ``window/slide`` overlapping windows — window
    assignment is a flat_map-style column expansion inside map_batches
    (each row emits its window replicas), then partial aggregation; no
    watermark machinery needed on a bounded log (SURVEY §2.9)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from gruut_ray.pipelines.agg_util import partial_then_merge

    slide_us = slide_hours * 3_600_000_000
    n_windows = window_hours // slide_hours

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        etype = np.asarray(batch.column("event_type").to_pylist())
        value_c = _cents(batch.column("value")).to_numpy()  # exact
        # window start w covers [w, w + window) — event t is in windows
        # starting at floor(t/slide)*slide - k*slide for k in 0..n-1
        base = (ts // slide_us) * slide_us
        rows = []
        for k in range(n_windows):
            rows.append(pd.DataFrame({
                "event_type": etype,
                "window_start": base - k * slide_us,
                "value_c": value_c,
            }))
        df = pd.concat(rows, ignore_index=True)
        agg = df.groupby(["event_type", "window_start"],
                         as_index=False).agg(
            n=("value_c", "size"), sum_value=("value_c", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(events, partials,
                             ["event_type", "window_start"],
                             {"n": "sum", "sum_value": "sum"},
                             exact_int_cols=["sum_value"])
    out["sum_value"] = (out["sum_value"] / 100.0).astype("float64")
    out["window_start"] = pd.to_datetime(
        out["window_start"], unit="us").astype("datetime64[us]")
    return (out.sort_values(["event_type", "window_start"])
            .reset_index(drop=True))


def shipping_priority(customer: "ray.data.Dataset",
                      orders: "ray.data.Dataset",
                      lineitem: "ray.data.Dataset",
                      segment: str = "BUILDING",
                      cutoff: str = "1998-06-01",
                      topn: int = 10,
                      num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q3-shaped three-table pipeline: filter → broadcast semi-join
    → shuffle hash join → partial aggregate → driver top-N.

    Scale shape: the segment-filtered customer KEYS broadcast via
    ``ray.put`` (a set of ints — tiny even at full TPC-H scale) and
    orders filter map-side, so only the date+segment-surviving orders
    reach the one real shuffle (orders ⋈ lineitem on orderkey).  Revenue
    is exact fixed-point (1e-4 dollars) like the other money pipelines;
    only (groups) rows reach the driver for the final top-N."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))
    cust_keys = customer.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"),
                                    pa.scalar(segment)))
        .select(["c_custkey"]),
        batch_format="pyarrow").to_pandas()
    keys_ref = ray.put(
        pa.array(sorted(cust_keys["c_custkey"].tolist()), type=pa.int64()))

    def filter_orders(batch: pa.Table, _cache={}) -> pa.Table:
        keys = _cache.get("keys")
        if keys is None:  # once per worker process
            keys = _cache["keys"] = ray.get(keys_ref)
        batch = batch.filter(pc.less(batch.column("o_orderdate"), cutoff_ts))
        mask = pc.is_in(batch.column("o_custkey"), value_set=keys)
        return batch.filter(mask).select(["o_orderkey", "o_orderdate"])

    o = (orders.map_batches(filter_orders, batch_format="pyarrow")
         .repartition(num_partitions))
    l = (lineitem.map_batches(
        lambda b: b.filter(pc.greater(b.column("l_shipdate"), cutoff_ts))
        .select(["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
        .repartition(num_partitions))
    joined = l.join(o, join_type="inner", num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",))

    def partials(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100), _cents(batch.column("l_discount"))))
        df = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "revenue": revenue,
        }).to_pandas()
        agg = df.groupby(["l_orderkey", "o_orderdate"], as_index=False).agg(
            revenue=("revenue", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(joined, partials, ["l_orderkey", "o_orderdate"],
                             {"revenue": "sum"},
                             exact_int_cols=["revenue"])
    out["revenue"] = (out["revenue"] / 1e4).astype("float64")
    out = out.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                          ascending=[False, True, True]).head(topn)
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out.reset_index(drop=True)


def part_type_summary(part: "ray.data.Dataset") -> pd.DataFrame:
    """Per-type part rollup (count, exact-money avg retail, size range) —
    partial-aggregate-then-merge, no shuffle of part rows."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "p_type": batch.column("p_type"),
            "retail_c": _cents(batch.column("p_retailprice")),
            "p_size": batch.column("p_size"),
        }).to_pandas()
        agg = df.groupby("p_type", as_index=False).agg(
            n_parts=("retail_c", "size"), sum_retail=("retail_c", "sum"),
            min_size=("p_size", "min"), max_size=("p_size", "max"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(
        part, partials, ["p_type"],
        {"n_parts": "sum", "sum_retail": "sum",
         "min_size": "min", "max_size": "max"},
        exact_int_cols=["sum_retail"])
    # exact integer average in cents (floor division) — the oracle uses
    # BIGINT // BIGINT, so both sides are bit-identical with no float
    # rounding boundary to disagree on
    out["avg_retail_c"] = [int(s) // int(n)
                           for s, n in zip(out["sum_retail"], out["n_parts"])]
    out["avg_retail_c"] = out["avg_retail_c"].astype("int64")
    out = out[["p_type", "n_parts", "avg_retail_c", "min_size", "max_size"]]
    return out.sort_values("p_type").reset_index(drop=True)


def daily_active_users(events: "ray.data.Dataset",
                       num_partitions: int = 16) -> pd.DataFrame:
    """Exact daily-active-users + event counts: the canonical exact
    count-distinct over a shuffle.

    Scale shape: each batch first collapses to its distinct
    (day, user_id) pairs with a partial event count (the ONLY all-to-all
    exchange then moves pair-count rows, never event rows — a day of
    10^10 events with 10^7 actives shuffles ≤ blocks × actives rows);
    the distributed ``groupby((day, user)).sum`` finishes the dedup, and
    per-day DAU/event totals merge from per-block partials (days are few
    — the driver holds only (days) rows)."""
    us_day = 86_400_000_000

    def pair_partials(batch: pa.Table) -> pa.Table:
        # normalize to us first: a pandas-born block arrives as ns and
        # a raw int64 cast would day-bucket nanoseconds
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.multiply(pc.divide(ts, us_day), us_day)
        tbl = pa.table({"day": day, "user_id": batch.column("user_id")})
        return tbl.group_by(["day", "user_id"]).aggregate(
            [("user_id", "count")]).rename_columns(
                ["day", "user_id", "n_events"])

    from ray.data.aggregate import Sum

    pairs = (events.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["day", "user_id"])
             .aggregate(Sum("n_events", alias_name="n_events")))

    def day_partials(batch: pa.Table) -> pa.Table:
        df = batch.select(["day", "n_events"]).to_pandas()
        agg = df.groupby("day", as_index=False).agg(
            dau=("n_events", "size"), n_events=("n_events", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    from gruut_ray.pipelines.agg_util import partial_then_merge

    out = partial_then_merge(pairs, day_partials, ["day"],
                             {"dau": "sum", "n_events": "sum"})
    out["day"] = pd.to_datetime(out["day"], unit="us").astype(
        "datetime64[us]")
    out["dau"] = out["dau"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["day", "dau", "n_events"]]
            .sort_values("day").reset_index(drop=True))


def user_retention(events: "ray.data.Dataset",
                   num_partitions: int = 32,
                   driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Next-day retention: per day, how many active users are active
    again the following day — the canonical self-join-on-shifted-key
    cohort metric, done without any self-join.

    Scale shape: batches collapse to distinct (day, user) pairs before
    the ONLY exchange (a keyed repartition on ``user_id``: all of one
    user's pair rows land in one block, so cross-batch duplicate pairs
    also collapse there); each block then computes, for ALL its users
    in one vectorized kernel, which (day → day+1) transitions exist,
    and emits tiny per-day partials that merge on the driver (days are
    few).  The same cut-over as :func:`sessionize` routes small inputs
    straight to the driver kernel (output-identical by construction)."""
    us_day = 86_400_000_000

    def pair_partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.multiply(pc.divide(ts, us_day), us_day)
        return (pa.table({"day": day,
                          "user_id": batch.column("user_id")})
                .group_by(["day", "user_id"]).aggregate([])
                .select(["day", "user_id"]))

    def block_retention(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["user_id", "day"])
             .sort_values(["user_id", "day"], kind="mergesort"))
        uid = g["user_id"].to_numpy()
        day = g["day"].astype("int64").to_numpy()
        retained = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            retained[:-1] = ((uid[1:] == uid[:-1])
                             & ((day[1:] - day[:-1]) == us_day))
        out = (pd.DataFrame({"day": day, "retained":
                             retained.astype("int64")})
               .groupby("day", as_index=False)
               .agg(n_users=("retained", "size"),
                    n_retained=("retained", "sum")))
        return out

    pairs = events.map_batches(pair_partials, batch_format="pyarrow")

    if events.count() <= driver_limit:
        out = block_retention(pairs.to_pandas())
    else:
        from ray.data.context import ShuffleStrategy

        prev = events.context.shuffle_strategy
        events.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            partials = (pairs.repartition(num_partitions,
                                          keys=["user_id"])
                        .map_batches(block_retention,
                                     batch_format="pandas",
                                     batch_size=None)
                        .to_pandas())
        finally:
            events.context.shuffle_strategy = prev
        out = (partials.groupby("day", as_index=False)
               .agg(n_users=("n_users", "sum"),
                    n_retained=("n_retained", "sum")))
    out["day"] = pd.to_datetime(out["day"], unit="us").astype(
        "datetime64[us]")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_retained"] = out["n_retained"].astype("int64")
    return (out[["day", "n_users", "n_retained"]]
            .sort_values("day").reset_index(drop=True))


def regional_revenue(customer: "ray.data.Dataset",
                     orders: "ray.data.Dataset",
                     lineitem: "ray.data.Dataset",
                     supplier: "ray.data.Dataset",
                     nation: "ray.data.Dataset",
                     region: "ray.data.Dataset",
                     region_name: str = "ASIA",
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1997-01-01",
                     num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q5-shaped six-table pipeline: local-supplier revenue per
    nation of one region and order-date year.

    Scale shape (two shuffles, everything else broadcast or map-side):
    region⋈nation collapses on the driver to a nation dict (≤ 25 rows);
    supplier projects to a suppkey→nationkey map broadcast via
    ``ray.put`` (the Q5 small side — at scales where suppliers outgrow
    worker heaps, swap for a third shuffle join, same plan shape as
    the dimensions in :func:`revenue_by_segment`); date-filtered orders
    shuffle-join customer (custkey) to tag each order with its
    customer's nation, then lineitem shuffle-joins on orderkey; the
    Q5 local-supplier predicate (customer and supplier in the SAME
    nation) evaluates map-side against the broadcast supplier map, and
    only (nation) partial-sum rows leave the final map.  Revenue is
    exact fixed-point (cents × percent = 1e-4 dollars), merged with
    arbitrary-precision ints like every other money pipeline."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    rkey = region.to_pandas()
    rkeys = set(rkey.loc[rkey["r_name"] == region_name, "r_regionkey"])
    nat = nation.to_pandas()
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nation_names = dict(zip(nat["n_nationkey"].astype("int64"),
                            nat["n_name"]))
    nation_keys = pa.array(sorted(nation_names), type=pa.int64())

    supp = supplier.map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_nationkey"),
                                    value_set=nation_keys))
        .select(["s_suppkey", "s_nationkey"]),
        batch_format="pyarrow").to_pandas()
    supp_ref = ray.put(dict(zip(supp["s_suppkey"].astype("int64"),
                                supp["s_nationkey"].astype("int64"))))

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    o = (orders.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), lo),
            pc.less(b.column("o_orderdate"), hi)))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
        .repartition(num_partitions))
    c = (customer.map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_nationkey"),
                                    value_set=nation_keys))
        .select(["c_custkey", "c_nationkey"]),
        batch_format="pyarrow")
        .repartition(num_partitions))
    if o.count() == 0 or c.count() == 0:
        # a fully-filtered side yields only schema-less empty blocks,
        # which acero's join rejects — and the answer is known anyway
        return pd.DataFrame(columns=["n_name", "revenue_c4", "n_items"])

    # materialize the first join's output before the second: cascading
    # two lazy hash joins puts both shuffles' aggregator actor pools in
    # ONE streaming plan, which starves small cpu counts into a stall
    # (observed at 4 cpus).  The pinned intermediate is the SMALL one —
    # a year of orders projected to two int columns — and executing the
    # joins sequentially is also the lower-peak-memory schedule at scale.
    oc = (o.join(c, join_type="inner", num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))
          .select_columns(["o_orderkey", "c_nationkey"])
          .repartition(num_partitions)
          .materialize())
    li = (lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .repartition(num_partitions))
    full = li.join(oc, join_type="inner",
                   num_partitions=num_partitions,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    def partials(batch: pa.Table, _cache={}) -> pa.Table:
        smap = _cache.get("s")
        if smap is None:
            smap = _cache["s"] = ray.get(supp_ref)
        df = pa.table({
            "l_suppkey": batch.column("l_suppkey"),
            "c_nationkey": batch.column("c_nationkey"),
            "revenue_c4": pc.multiply(
                _cents(batch.column("l_extendedprice")),
                pc.subtract(pa.scalar(100),
                            _cents(batch.column("l_discount")))),
        }).to_pandas()
        s_nat = df["l_suppkey"].map(smap)
        df = df[s_nat.notna() & (s_nat == df["c_nationkey"])]
        if df.empty:
            return pa.table({
                "n_nationkey": pa.array([], type=pa.int64()),
                "revenue_c4": pa.array([], type=pa.int64()),
                "n_items": pa.array([], type=pa.int64()),
            })
        agg = (df.groupby("c_nationkey", as_index=False)
               .agg(revenue_c4=("revenue_c4", "sum"),
                    n_items=("revenue_c4", "size"))
               .rename(columns={"c_nationkey": "n_nationkey"}))
        agg["n_nationkey"] = agg["n_nationkey"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials, ["n_nationkey"],
                             {"revenue_c4": "sum", "n_items": "sum"},
                             exact_int_cols=("revenue_c4",))
    if out.empty:
        return pd.DataFrame(columns=["n_name", "revenue_c4", "n_items"])
    out["n_name"] = out["n_nationkey"].map(nation_names)
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return (out[["n_name", "revenue_c4", "n_items"]]
            .sort_values(["revenue_c4", "n_name"],
                         ascending=[False, True])
            .reset_index(drop=True))


def customer_distribution(customer: "ray.data.Dataset",
                          orders: "ray.data.Dataset",
                          num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly k orders, including k=0 (ref workload shape only —
    gruut has no relational ops; this covers SURVEY §2.5 join-type
    inventory: LEFT OUTER).

    Scale shape: orders pre-aggregate per batch to (custkey, n) partials
    (combiner) → small groupby → the customer key column LEFT OUTER
    joins the counts (nulls are the zero-order customers) → the
    distribution itself merges as tiny (c_count, custdist) partials.
    Only (custkey, count) pairs ever shuffle; order rows never do."""
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = pa.table({"o_custkey": batch.column("o_custkey")}).to_pandas()
        agg = df.groupby("o_custkey", as_index=False).agg(
            n=("o_custkey", "size"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    counts = (orders.select_columns(["o_custkey"])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("o_custkey")
              .aggregate(Sum("n", alias_name="c_count"))
              .map_batches(
                  lambda b: (pa.table({
                      "o_custkey": pa.array([], type=pa.int64()),
                      "c_count": pa.array([], type=pa.int64())})
                      if b.num_columns == 0 else
                      pa.table({
                          "o_custkey": pc.cast(b.column("o_custkey"),
                                               pa.int64()),
                          "c_count": pc.cast(b.column("c_count"),
                                             pa.int64())})),
                  batch_format="pyarrow")
              .repartition(num_partitions))

    cust = customer.select_columns(["c_custkey"]) \
        .repartition(num_partitions)
    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))

    def dist_partials(batch: pa.Table) -> pa.Table:
        cc = pc.fill_null(pc.cast(batch.column("c_count"), pa.int64()), 0)
        df = pa.table({"c_count": cc}).to_pandas()
        agg = df.groupby("c_count", as_index=False).agg(
            custdist=("c_count", "size"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(joined, dist_partials, ["c_count"],
                             {"custdist": "sum"}, sort=False)
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return (out.sort_values(["custdist", "c_count"],
                            ascending=[False, False])
            .reset_index(drop=True))


def customers_without_orders(customer: "ray.data.Dataset",
                             orders: "ray.data.Dataset",
                             num_partitions: int = 8) -> pd.DataFrame:
    """Customers that never placed an order, via the native LEFT ANTI
    hash join (SURVEY §2.5 join-type inventory).  Returns the count and
    the custkey checksum (hash-stable scalar witnesses; the row set
    itself can be huge at scale).

    Scale shape: the orders side reduces to distinct custkeys per batch
    (combiner) before the anti join, so the join's build side is ≤
    |customers| keys regardless of order count."""

    def distinct_keys(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column("o_custkey"))
        return pa.table({"o_custkey": keys})

    keys = (orders.select_columns(["o_custkey"])
            .map_batches(distinct_keys, batch_format="pyarrow")
            .repartition(num_partitions))
    cust = customer.select_columns(["c_custkey"]) \
        .repartition(num_partitions)
    anti = cust.join(keys, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))

    def partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey")
        return pa.table({
            "n_customers": pa.array([batch.num_rows], type=pa.int64()),
            "custkey_sum": pa.array(
                [pc.sum(pc.cast(ck, pa.int64())).as_py() or 0],
                type=pa.int64()),
        })

    parts = anti.map_batches(partials, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"n_customers": [0], "custkey_sum": [0]})
    return pd.DataFrame({
        "n_customers": [int(parts["n_customers"].sum())],
        "custkey_sum": [int(parts["custkey_sum"].sum())],
    })


def user_rolling_window(events: "ray.data.Dataset", window: int = 10,
                        num_partitions: int = 32,
                        driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Per-key ROWS-window rolling aggregate — SQL
    ``SUM(...) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — via the same
    per-BLOCK pattern as :func:`sessionize`: hash-repartition on
    ``user_id`` co-locates each user's rows, then ONE numpy kernel per
    block sorts by (user_id, ts, event_id) and computes every user's
    rolling sum at once from a block-global cumsum (no per-group UDF
    dispatch, no per-row loop).  Money is summed as exact int64 cents
    (:func:`_cents`) so the result is bit-identical to the SQL window
    oracle regardless of summation order.

    Partitioning assumption: one user's rows fit in one block (same as
    sessionize/asof).  Returns (event_id, user_id, rolling_value)
    sorted by event_id."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "ts": batch.column("ts"),
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "cents": _cents(batch.column("value")),
        })

    slim = events.map_batches(project, batch_format="pyarrow")

    def block_rolling(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        n = len(g)
        uid = g["user_id"].to_numpy()
        cents = g["cents"].to_numpy(dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)
        boundary = np.ones(n, dtype=bool)
        if n > 1:
            boundary[1:] = uid[1:] != uid[:-1]
        group_start = np.maximum.accumulate(np.where(boundary, idx, 0))
        pos = idx - group_start  # 0-based position within the user
        cs = np.cumsum(cents)
        # index of the last row BEFORE the window: never crosses into the
        # previous user because the window is clipped to min(pos, w-1)
        prev = idx - np.minimum(pos, window - 1) - 1
        roll = cs - np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": uid,
            "rolling_value": roll / 100.0,
        })

    if events.count() <= driver_limit:  # metadata-only on parquet reads
        out = block_rolling(slim.to_pandas())
        return out.sort_values("event_id").reset_index(drop=True)

    from ray.data.context import ShuffleStrategy

    prev_strategy = events.context.shuffle_strategy
    events.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        out = (slim.repartition(num_partitions, keys=["user_id"])
               .map_batches(block_rolling, batch_format="pandas",
                            batch_size=None)
               .to_pandas())
    finally:
        events.context.shuffle_strategy = prev_strategy
    return out.sort_values("event_id").reset_index(drop=True)


def skew_aware_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str,
    hot_fraction: float = 0.001,
    num_partitions: int = 16,
    broadcast_limit: int = 1_000_000,
    k: typing.Optional[int] = None,
) -> "ray.data.Dataset":
    """Inner join that survives power-law key skew — the "salt hot keys"
    pattern made concrete.  A plain hash join routes every row of a hot
    key to ONE reducer (a 10%-frequency key at 10^12 rows pins 10^11
    rows on one worker); here:

    1. a Misra-Gries heavy-hitter sketch over the LEFT key column finds
       candidate hot keys in one bounded-memory pass (``k`` is sized so
       every key with frequency > ``hot_fraction`` is GUARANTEED
       captured; using the sketch's upper bound admits a harmless
       superset);
    2. RIGHT rows for hot keys are pulled once and broadcast via
       ``ray.put`` — hot-key left rows join map-side inside
       ``map_batches``, so their fan-out parallelizes over every block
       instead of collapsing onto one reducer;
    3. the cold remainder (near-uniform by construction) takes the
       normal shuffle hash join;
    4. the two streams union (schemas are aligned column-for-column).

    Falls back to the plain hash join when no key is hot or the hot
    right side exceeds ``broadcast_limit`` rows.  Output rows are
    identical to the plain join (unit-tested)."""
    import ray

    from gruut_ray.pipelines.sketches import heavy_hitters

    def as_arrow(ds):
        s = ds.schema().base_schema
        if isinstance(s, pa.Schema):
            return ds, s
        # pandas-block input: normalize to Arrow blocks once
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        return ds, ds.schema().base_schema

    left, lt = as_arrow(left)
    right, rt = as_arrow(right)
    # native Dataset.join emits left columns + right columns MINUS the
    # right key (it is equal to the left key by definition); both paths
    # produce this schema
    out_fields = list(zip(lt.names, lt.types)) + \
        [(n, t) for n, t in zip(rt.names, rt.types) if n != right_on]

    def plain():
        return left.repartition(num_partitions).join(
            right.repartition(num_partitions), join_type="inner",
            num_partitions=num_partitions, on=(on,),
            right_on=(right_on,))

    n_left = left.count()
    if n_left == 0 or right.count() == 0:
        return plain()
    # k sized to the capture guarantee by default; a caller may pass a
    # smaller k — the hot set becomes best-effort, but the JOIN OUTPUT
    # is identical for ANY hot/cold split (only load balance changes)
    if k is None:
        k = max(64, int(4.0 / hot_fraction))
    key_type = lt.field(on).type
    is_int_key = pa.types.is_integer(key_type)
    # heavy_hitters stringifies sketch items; only integer and string
    # keys round-trip losslessly — any other key type (float, temporal,
    # decimal) takes the plain hash join (review r03 finding: the
    # str→typed rebuild raised ArrowInvalid for those types)
    if not (is_int_key or pa.types.is_string(key_type)
            or pa.types.is_large_string(key_type)):
        return plain()
    hh = heavy_hitters(left.select_columns([on]), on, k=k)
    cut = hot_fraction * n_left
    hot_vals = [int(i) if is_int_key else i
                for i, mx in zip(hh["item"], hh["max_count"])
                if i is not None and mx >= cut]
    if not hot_vals:
        return plain()
    hot_arr = pa.array(hot_vals, type=key_type)

    def side_filter(key_col: str, want_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(key_col), hot_arr)
            return batch.filter(mask if want_hot else pc.invert(mask))
        return fn

    # collect the hot right side as ARROW (a pandas round-trip would
    # coerce nullable int64 → float64 and silently round values ≥ 2^53
    # on rebuild — review r03 finding; the arrow path preserves types
    # exactly, keeping hot-path rows bit-identical to the cold join)
    right_hot_tbls = ray.get(
        right.map_batches(side_filter(right_on, True),
                          batch_format="pyarrow").to_arrow_refs())
    right_hot = pa.concat_tables(
        [t for t in right_hot_tbls if t.num_rows] or [rt.empty_table()])
    if right_hot.num_rows > broadcast_limit:
        return plain()
    right_hot_ref = ray.put(right_hot)

    def hot_join(batch: pa.Table, _cache={}) -> pa.Table:
        rh = _cache.get(right_hot_ref)
        if rh is None:
            # bound the per-worker cache to ONE broadcast table: each
            # call site ray.puts a fresh ref, and the closure outlives
            # the query in Ray's cached-function table (review r03)
            _cache.clear()
            rh = _cache[right_hot_ref] = ray.get(right_hot_ref)
        joined = batch.join(rh, keys=[on], right_keys=[right_on],
                            join_type="inner")
        return joined.select([n for n, _ in out_fields])

    hot_joined = (left.map_batches(side_filter(on, True),
                                   batch_format="pyarrow")
                  .map_batches(hot_join, batch_format="pyarrow"))

    cold_joined = (left.map_batches(side_filter(on, False),
                                    batch_format="pyarrow")
                   .repartition(num_partitions)
                   .join(right.map_batches(side_filter(right_on, False),
                                           batch_format="pyarrow")
                         .repartition(num_partitions),
                         join_type="inner",
                         num_partitions=num_partitions,
                         on=(on,), right_on=(right_on,)))
    # align column ORDER before union (join output order can differ)
    names = [n for n, _ in out_fields]
    return hot_joined.select_columns(names).union(
        cold_joined.select_columns(names))


def returned_item_revenue(customer: "ray.data.Dataset",
                          orders: "ray.data.Dataset",
                          lineitem: "ray.data.Dataset",
                          nation: "ray.data.Dataset",
                          topn: int = 20,
                          num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top-N.  Composition of the repo's standard scale patterns: filtered
    fact projection → large×large shuffle join (lineitem ⋈ orders on
    orderkey) → per-batch exact-int partials keyed by custkey (the
    exchange carries (custkey, int) pairs, never lineitems) → the tiny
    per-customer rollup joins the customer/nation dimensions driver-side
    (broadcast-sized; at dimension scale swap for the
    :func:`skew_aware_join` path) → deterministic top-N
    (revenue desc, custkey asc)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    l = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("l_returnflag"), pa.scalar("R"))
        batch = batch.filter(mask)
        revenue = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100), _cents(batch.column("l_discount"))))
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "revenue": revenue})

    o = orders.select_columns(["o_orderkey", "o_custkey"]) \
        .repartition(num_partitions)
    joined = (l.map_batches(filt, batch_format="pyarrow")
              .repartition(num_partitions)
              .join(o, join_type="inner", num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",)))

    def partials(batch: pa.Table) -> pa.Table:
        df = pa.table({"o_custkey": batch.column("o_custkey"),
                       "revenue": batch.column("revenue")}).to_pandas()
        agg = df.groupby("o_custkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    per_cust = partial_then_merge(joined, partials, ["o_custkey"],
                                  {"revenue": "sum"},
                                  exact_int_cols=["revenue"])

    cust = customer.select_columns(
        ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    out = (per_cust.merge(cust, left_on="o_custkey",
                          right_on="c_custkey")
           .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    out = (out.sort_values(["revenue", "c_custkey"],
                           ascending=[False, True], kind="mergesort")
           .head(topn).reset_index(drop=True))
    out["revenue"] = (out["revenue"] / 1e4).astype("float64")
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


def _us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """timestamp[us] column → int64 epoch microseconds (exact reinterpret;
    mirrors DuckDB's ``epoch_us()`` so both engines compare the same
    integers)."""
    return pc.cast(col, pa.int64())


def late_order_priority(orders: "ray.data.Dataset",
                        lineitem: "ray.data.Dataset",
                        late_days: int = 60,
                        num_partitions: int = 16,
                        driver_limit: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: count orders per priority that had
    at least one lineitem shipped more than ``late_days`` after the order
    date (SQL ``WHERE EXISTS (... l_shipdate > o_orderdate + 60 DAY)``).

    Scale shape: ``EXISTS(l_shipdate > t)`` ≡ ``max(l_shipdate) > t``, so
    lineitem first combines per batch to one (orderkey, max_ship) row —
    the groupby then shuffles ≤ one row per order per block instead of
    every lineitem — and the distributed max joins orders by hash.  The
    final rollup is five rows (ref gruut has no relational ops; this is a
    north-rule addition exercising semi-join + combiner patterns).

    Size cut-over (same pattern as sessionize): below ``driver_limit``
    distinct orderkeys the per-batch max partials reduce on the driver
    and broadcast back as a dict into a shuffle-free scan of orders —
    the per-query hash-shuffle aggregator spin-up (~4 s fixed) dominates
    small inputs.  Output-identical by construction; the distributed
    groupby+join takes over at scale."""
    from ray.data.aggregate import Max

    from gruut_ray.pipelines.agg_util import partial_then_merge

    late_us = late_days * 86_400_000_000

    def partial_max(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "max_ship_us": _us(batch.column("l_shipdate")),
        })
        agg = t.group_by("l_orderkey").aggregate([("max_ship_us", "max")])
        return pa.table({"l_orderkey": agg.column("l_orderkey"),
                         "max_ship_us": agg.column("max_ship_us_max")})

    partials_ds = (lineitem.select_columns(["l_orderkey", "l_shipdate"])
                   .map_batches(partial_max, batch_format="pyarrow"))

    if lineitem.count() <= driver_limit:  # metadata-only on parquet reads
        import ray

        pm = partials_ds.to_pandas().groupby("l_orderkey")["max_ship_us"] \
            .max().sort_index()
        # two sorted arrays + searchsorted beat a broadcast dict: tiny
        # serialization, zero per-row Python in the lookup
        max_ref = ray.put((pm.index.to_numpy(dtype=np.int64),
                           pm.to_numpy(dtype=np.int64)))

        def count_late(batch: pa.Table, _cache={}) -> pa.Table:
            if "m" not in _cache:
                _cache["m"] = ray.get(max_ref)
            mkeys, mvals = _cache["m"]
            keys = pc.cast(batch.column("o_orderkey"),
                           pa.int64()).to_numpy(zero_copy_only=False)
            odate = _us(batch.column("o_orderdate")).to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(mkeys, keys)
            pos_c = np.clip(pos, 0, len(mkeys) - 1)
            found = mkeys[pos_c] == keys
            ship = np.where(found, mvals[pos_c], -(1 << 62))
            late = ship > odate + late_us
            df = pd.DataFrame({
                "o_orderpriority":
                    batch.column("o_orderpriority").to_pylist(),
                "late": late})
            agg = df[df["late"]].groupby("o_orderpriority",
                                         as_index=False).size() \
                .rename(columns={"size": "n_orders"})
            return pa.Table.from_pandas(
                agg, preserve_index=False).replace_schema_metadata(None)

        return partial_then_merge(
            orders.select_columns(["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]),
            count_late, ["o_orderpriority"], {"n_orders": "sum"})

    maxship = (partials_ds
               .groupby("l_orderkey")
               .aggregate(Max("max_ship_us", alias_name="max_ship_us"))
               .repartition(num_partitions))  # merge schema-less empties
    o = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .repartition(num_partitions)
    joined = o.join(maxship, join_type="inner",
                    num_partitions=num_partitions,
                    on=("o_orderkey",), right_on=("l_orderkey",))

    def partials(batch: pa.Table) -> pa.Table:
        late = pc.greater(batch.column("max_ship_us"),
                          pc.add(_us(batch.column("o_orderdate")),
                                 pa.scalar(late_us)))
        t = batch.filter(late)
        df = pa.table({"o_orderpriority": t.column("o_orderpriority")}) \
            .to_pandas()
        agg = df.groupby("o_orderpriority", as_index=False).size() \
            .rename(columns={"size": "n_orders"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    return partial_then_merge(joined, partials, ["o_orderpriority"],
                              {"n_orders": "sum"})


def ship_delay_priority(orders: "ray.data.Dataset",
                        lineitem: "ray.data.Dataset",
                        num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q12-shaped CASE aggregation: lineitems bucketed by ship delay
    (floor days between order and ship date — the synthetic data ships
    early as well as late, so 'early' is a real bucket), counting
    high-priority (1-URGENT/2-HIGH) vs low-priority lines per bucket.

    Scale shape: large×large hash join projected to 4 columns, then the
    CASE+count collapses inside each batch (combiner) — the final merge
    is 4 rows × blocks."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    o = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .repartition(num_partitions)
    l = lineitem.select_columns(["l_orderkey", "l_shipdate"]) \
        .repartition(num_partitions)
    joined = l.join(o, join_type="inner", num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",))
    buckets = np.array(["early", "0-29", "30-59", "60+"])

    def partials(batch: pa.Table) -> pa.Table:
        ship = _us(batch.column("l_shipdate")).to_numpy(zero_copy_only=False)
        order = _us(batch.column("o_orderdate")).to_numpy(
            zero_copy_only=False)
        days = np.floor_divide(ship - order, 86_400_000_000)
        idx = np.clip(days // 30 + 1, 0, 3).astype(np.int64)
        prio = batch.column("o_orderpriority").to_numpy(
            zero_copy_only=False)
        high = np.isin(prio, ("1-URGENT", "2-HIGH"))
        df = pd.DataFrame({"delay_bucket": buckets[idx], "high": high})
        agg = df.groupby("delay_bucket", as_index=False).agg(
            high_line_count=("high", "sum"),
            low_line_count=("high", lambda s: int((~s).sum())))
        agg["high_line_count"] = agg["high_line_count"].astype("int64")
        agg["low_line_count"] = agg["low_line_count"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    return partial_then_merge(joined, partials, ["delay_bucket"],
                              {"high_line_count": "sum",
                               "low_line_count": "sum"})


def large_volume_customers(customer: "ray.data.Dataset",
                           orders: "ray.data.Dataset",
                           lineitem: "ray.data.Dataset",
                           min_quantity: float = 250.0,
                           topn: int = 100,
                           num_partitions: int = 16,
                           driver_limit: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q18-shaped GROUP BY ... HAVING: orders whose total lineitem
    quantity exceeds ``min_quantity``, joined back to orders and customer,
    top ``topn`` by quantity.

    Scale shape: quantity sums combine per batch (one row per orderkey per
    block) before the distributed groupby; the HAVING filter runs on the
    aggregate stream so only the tiny qualifying set (p99+ of orders)
    enters the orders hash join; the top-k reduces per batch before the
    driver merge, and customer names for the ≤ ``topn`` winners come from
    a broadcast-key filtered scan of customer (ships ``topn`` rows, never
    a second all-to-all — two chained ``Dataset.join`` hash shuffles also
    deadlock under a small-CPU Ray instance, each pool waiting on the
    other's aggregator actors).  Quantity is exact int64 hundredths
    end-to-end.

    Size cut-over (same pattern as sessionize): below ``driver_limit``
    lineitem rows the qty partials reduce on the driver and the winner
    orderkeys broadcast into a filtered scan of orders — the per-query
    hash-shuffle aggregator spin-up (~4 s fixed) dominates small inputs.
    Output-identical; the distributed groupby+join takes over at scale."""
    from ray.data.aggregate import Sum

    min_qc = int(round(min_quantity * 100))

    def partial_qty(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "qty_c": _cents(batch.column("l_quantity")),
        })
        agg = t.group_by("l_orderkey").aggregate([("qty_c", "sum")])
        return pa.table({"l_orderkey": agg.column("l_orderkey"),
                         "qty_c": agg.column("qty_c_sum")})

    qty_partials = (lineitem.select_columns(["l_orderkey", "l_quantity"])
                    .map_batches(partial_qty, batch_format="pyarrow"))

    if lineitem.count() <= driver_limit:  # metadata-only on parquet reads
        import ray

        q = qty_partials.to_pandas().groupby(
            "l_orderkey", as_index=False)["qty_c"].sum()
        winners = q[q["qty_c"] > min_qc]
        keys_ref = ray.put(frozenset(winners["l_orderkey"].astype("int64")))

        def pick_orders(batch: pa.Table, _cache={}) -> pa.Table:
            if "keys" not in _cache:
                _cache["keys"] = np.fromiter(ray.get(keys_ref),
                                             dtype=np.int64)
            mask = np.isin(batch.column("o_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64), _cache["keys"])
            return batch.filter(pa.array(mask))

        odf = (orders.select_columns(["o_orderkey", "o_custkey",
                                      "o_totalprice"])
               .map_batches(pick_orders, batch_format="pyarrow")
               .to_pandas())
        parts = winners.rename(columns={"l_orderkey": "_k"}).merge(
            odf, left_on="_k", right_on="o_orderkey") \
            .drop(columns=["o_orderkey"]) \
            .rename(columns={"_k": "l_orderkey"})
    else:
        def having(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.greater(batch.column("qty_c"),
                                           pa.scalar(min_qc)))

        big = (qty_partials
               .groupby("l_orderkey")
               .aggregate(Sum("qty_c", alias_name="qty_c"))
               .map_batches(having, batch_format="pyarrow")
               .repartition(num_partitions))  # merge schema-less empties
        o = orders.select_columns(
            ["o_orderkey", "o_custkey", "o_totalprice"]) \
            .repartition(num_partitions)
        jo = big.join(o, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

        def local_topk(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(
                df.sort_values(["qty_c", "l_orderkey"],
                               ascending=[False, True], kind="mergesort")
                .head(topn),
                preserve_index=False).replace_schema_metadata(None)

        parts = jo.map_batches(local_topk,
                               batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"c_name": [], "c_custkey": [],
                             "o_orderkey": [], "o_totalprice": [],
                             "total_qty": []})
    out = (parts.sort_values(["qty_c", "l_orderkey"],
                             ascending=[False, True], kind="mergesort")
           .head(topn).reset_index(drop=True))

    # c_name for the ≤ topn winners: broadcast the key set into a filtered
    # scan — every customer block is read (column-pruned) but only matching
    # rows leave the tasks, so the driver holds ≤ topn rows at any scale.
    import ray

    keys_ref = ray.put(frozenset(out["o_custkey"].astype("int64")))

    def pick(batch: pa.Table, _cache={}) -> pa.Table:
        if "keys" not in _cache:
            _cache["keys"] = np.fromiter(ray.get(keys_ref), dtype=np.int64)
        mask = np.isin(batch.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64), _cache["keys"])
        return batch.filter(pa.array(mask))

    names = (customer.select_columns(["c_custkey", "c_name"])
             .map_batches(pick, batch_format="pyarrow").to_pandas())
    out = out.merge(names, left_on="o_custkey", right_on="c_custkey",
                    how="inner")
    out = (out.sort_values(["qty_c", "l_orderkey"],
                           ascending=[False, True], kind="mergesort")
           .reset_index(drop=True))
    out["total_qty"] = (out["qty_c"] / 100.0).astype("float64")
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    return out[["c_name", "c_custkey", "o_orderkey", "o_totalprice",
                "total_qty"]]


def bucketed_join_revenue(orders: "ray.data.Dataset",
                          lineitem: "ray.data.Dataset",
                          scratch_dir: str,
                          num_buckets: int = 16) -> pd.DataFrame:
    """Co-partitioned BUCKETED join: both tables are written ONCE
    partitioned by ``affine31(key) % num_buckets``; the join then runs
    per bucket as independent Ray tasks, each joining two small
    co-bucketed parquet directories locally — ZERO exchange at join time.

    This is the at-scale answer to "pick one partitioning key and reuse
    it": the bucket write is a one-time cost amortized over every later
    join/groupby on the same key (a 100 TB fact table re-shuffled per
    query vs re-read per bucket).  Same result as
    :func:`revenue_by_priority` by construction — the driver checks it
    against the identical SQL oracle.

    Ray shape: the bucket writes are ordinary partitioned
    ``write_parquet`` calls; the per-bucket joins are plain ``@ray.remote``
    tasks (the Dataset API would re-shuffle; a bucket is already the unit
    of parallelism), each using one pyarrow hash join + the shared
    fixed-point revenue partial; the driver merges (buckets × 5) rows."""
    import os

    import ray

    from gruut_ray.pipelines.hash31 import affine31

    def add_bucket(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(col).to_numpy(zero_copy_only=False)
            b = affine31(ids) % num_buckets
            return batch.append_column("bucket",
                                       pa.array(b, type=pa.int32()))
        return fn

    o_dir = os.path.join(scratch_dir, "orders_b")
    l_dir = os.path.join(scratch_dir, "lineitem_b")
    (orders.select_columns(["o_orderkey", "o_orderpriority"])
     .map_batches(add_bucket("o_orderkey"), batch_format="pyarrow")
     .write_parquet(o_dir, partition_cols=["bucket"]))
    (lineitem.select_columns(["l_orderkey", "l_extendedprice",
                              "l_discount"])
     .map_batches(add_bucket("l_orderkey"), batch_format="pyarrow")
     .write_parquet(l_dir, partition_cols=["bucket"]))

    @ray.remote
    def join_bucket(b: int) -> "pd.DataFrame":
        import glob

        import pyarrow.parquet as pq

        def read_bucket(root):
            files = glob.glob(os.path.join(root, f"bucket={b}",
                                           "*.parquet"))
            if not files:
                return None
            return pa.concat_tables(pq.read_table(f) for f in files)

        ot = read_bucket(o_dir)
        lt = read_bucket(l_dir)
        if ot is None or lt is None:
            return pd.DataFrame()
        j = lt.join(ot, keys=["l_orderkey"], right_keys=["o_orderkey"],
                    join_type="inner")
        revenue = pc.multiply(
            _cents(j.column("l_extendedprice")),
            pc.subtract(pa.scalar(100), _cents(j.column("l_discount"))))
        df = pa.table({"o_orderpriority": j.column("o_orderpriority"),
                       "revenue": revenue}).to_pandas()
        return df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))

    parts = [p for p in ray.get([join_bucket.remote(b)
                                 for b in range(num_buckets)])
             if not p.empty]
    merged = pd.concat(parts, ignore_index=True)
    out = merged.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum"))
    out = out.sort_values("o_orderpriority").reset_index(drop=True)
    out["revenue"] = (out["revenue"] / 1e4).astype("float64")
    out["n_items"] = out["n_items"].astype("int64")
    return out


def nation_coverage(customer: "ray.data.Dataset",
                    supplier: "ray.data.Dataset",
                    num_partitions: int = 4) -> pd.DataFrame:
    """FULL OUTER join demo over real asymmetry: per-nation customer
    counts vs per-nation supplier counts (at small SF many nations have
    customers but no suppliers and vice versa, so both null sides are
    exercised).  Counts pre-aggregate per side (combiner) before the
    join, so the outer join moves ≤ |nations| rows per side; Ray's
    full_outer coalesces the key into the left key column."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def side(ds, key, out_col):
        def partials(batch: pa.Table) -> pa.Table:
            df = pa.table({"k": pc.cast(batch.column(key),
                                        pa.int64())}).to_pandas()
            agg = df.groupby("k", as_index=False).size() \
                .rename(columns={"size": out_col})
            return pa.Table.from_pandas(
                agg, preserve_index=False).replace_schema_metadata(None)

        merged = partial_then_merge(ds.select_columns([key]), partials,
                                    ["k"], {out_col: "sum"})
        return ray.data.from_arrow(pa.table({
            "k" if out_col == "n_customers" else "ks":
                pa.array(merged["k"], type=pa.int64()),
            out_col: pa.array(merged[out_col], type=pa.int64()),
        })).repartition(num_partitions)

    c = side(customer, "c_nationkey", "n_customers")
    s = side(supplier, "s_nationkey", "n_suppliers")
    j = c.join(s, join_type="full_outer", num_partitions=num_partitions,
               on=("k",), right_on=("ks",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": pc.cast(batch.column("k"), pa.int64()),
            "n_customers": pc.cast(pc.coalesce(
                batch.column("n_customers"), 0), pa.int64()),
            "n_suppliers": pc.cast(pc.coalesce(
                batch.column("n_suppliers"), 0), pa.int64()),
        })

    out = j.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("nationkey").reset_index(drop=True)


_FUNNEL_SENTINEL = 1 << 62  # "never did this step"


def funnel_counts(events: "ray.data.Dataset",
                  steps: typing.Sequence[str] = ("view", "click",
                                                 "purchase"),
                  num_partitions: int = 16,
                  driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Ordered three-step funnel by FIRST occurrence: users whose first
    ``steps[0]`` precedes their first ``steps[1]`` precedes their first
    ``steps[2]`` (strictly increasing event time — the standard product-
    analytics funnel).  Returns one row (n_s1, n_s2, n_s3).

    Scale shape: each batch combines to (user, min-ts per step) with an
    int64 "never" sentinel so the distributed reduce is three plain Min
    aggregates — no NULL-aware combiner needed — then the ordering test
    collapses per batch to three counters.  Below ``driver_limit`` event
    rows the per-batch partials reduce on the driver instead (the
    hash-shuffle aggregator spin-up dominates small inputs);
    output-identical by construction."""
    s1, s2, s3 = steps

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        ts = _us(batch.column("ts")).to_numpy(zero_copy_only=False)
        uid = pc.cast(batch.column("user_id"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "et": et, "ts": ts})
        out = {}
        for name, step in (("t1", s1), ("t2", s2), ("t3", s3)):
            m = df[df["et"] == step].groupby("user_id")["ts"].min()
            out[name] = m
        merged = pd.DataFrame(out).reindex(
            sorted(set().union(*[v.index for v in out.values()]))
        ).fillna(_FUNNEL_SENTINEL).astype("int64")
        merged.index.name = "user_id"
        return pa.Table.from_pandas(
            merged.reset_index(), preserve_index=False
        ).replace_schema_metadata(None)

    slim = events.select_columns(["user_id", "event_type", "ts"])
    parts = slim.map_batches(partials, batch_format="pyarrow")

    if events.count() <= driver_limit:  # metadata-only on parquet reads
        per_user = parts.to_pandas().groupby("user_id")[
            ["t1", "t2", "t3"]].min()
    else:
        from ray.data.aggregate import Min

        agg = (parts.groupby("user_id")
               .aggregate(Min("t1", alias_name="t1"),
                          Min("t2", alias_name="t2"),
                          Min("t3", alias_name="t3"))
               .repartition(num_partitions))
        per_user = agg.to_pandas().set_index("user_id")[["t1", "t2", "t3"]]
        # (per_user is |users| rows — at true scale, push the comparison
        # below into a map_batches partial instead; kept driver-side here
        # because the three counters are the only output)

    S = _FUNNEL_SENTINEL
    t1 = per_user["t1"].to_numpy()
    t2 = per_user["t2"].to_numpy()
    t3 = per_user["t3"].to_numpy()
    did1 = t1 < S
    did12 = did1 & (t2 < S) & (t2 > t1)
    did123 = did12 & (t3 < S) & (t3 > t2)
    return pd.DataFrame({"n_s1": [int(did1.sum())],
                         "n_s2": [int(did12.sum())],
                         "n_s3": [int(did123.sum())]})


def event_gap_histogram(events: "ray.data.Dataset",
                        bucket_hours: int = 1,
                        num_partitions: int = 32,
                        driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Inter-event gap distribution — SQL
    ``epoch_us(ts) − lag(epoch_us(ts)) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)`` bucketed to hours and counted.  The lag/lead
    window family done the engine's way: hash-repartition co-locates each
    user, ONE numpy kernel per block sorts and diffs every user at once
    (user boundaries masked), and only (bucket, count) partials move.

    All-integer output (floor-div bucketing both engines), so the DuckDB
    window oracle compares exactly."""
    bucket_us = bucket_hours * 3_600_000_000

    def block_gaps(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"gap_bucket": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        buckets = np.floor_divide(gaps, bucket_us)
        vals, counts = np.unique(buckets, return_counts=True)
        return pd.DataFrame({"gap_bucket": vals.astype(np.int64),
                             "n": counts.astype(np.int64)})

    slim = events.select_columns(["user_id", "ts", "event_id"])
    if events.count() <= driver_limit:  # metadata-only on parquet reads
        out = block_gaps(slim.to_pandas())
    else:
        from ray.data.context import ShuffleStrategy

        prev = slim.context.shuffle_strategy
        slim.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            parts = (slim.repartition(num_partitions, keys=["user_id"])
                     .map_batches(block_gaps, batch_format="pandas",
                                  batch_size=None)
                     .to_pandas())
        finally:
            slim.context.shuffle_strategy = prev
        out = parts.groupby("gap_bucket", as_index=False)["n"].sum()
    out = out.sort_values("gap_bucket").reset_index(drop=True)
    out["gap_bucket"] = out["gap_bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def extract_json_int_field(col: pa.ChunkedArray | pa.Array,
                           field: str) -> pa.Array:
    """Vectorized integer-field extraction from a JSON string column:
    one RE2 pass handles the flat ``"field": <int>`` shape (the common
    case for event-property blobs); rows the regex misses (nested,
    quoted, absent) fall back to ``json.loads`` individually, so the
    fast path never changes semantics.  Returns int64 with nulls for
    missing/non-integer fields."""
    import json
    import re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat = (r'"' + re.escape(field) + r'"\s*:\s*(?P<v>-?[0-9]+)'
           r'(?P<after>\s*[,}])')
    hit = pc.extract_regex(col, pattern=pat)
    # the regex would also match INSIDE a nested object/array, where the
    # field is not top-level ($.k semantics) — only trust it for flat
    # one-object rows; everything else goes through json.loads
    flat = pc.and_(pc.equal(pc.count_substring(col, "{"), 1),
                   pc.equal(pc.count_substring(col, "["), 0))
    hit = pc.if_else(pc.fill_null(flat, False), hit,
                     pa.scalar(None, hit.type))
    fast = pc.struct_field(hit, [0])
    need_slow = pc.and_kleene(pc.is_valid(col), pc.is_null(hit))
    if pc.any(need_slow).as_py():
        vals = fast.to_pylist()
        raw = col.to_pylist()
        for i, slow in enumerate(need_slow.to_pylist()):
            if slow:
                try:
                    v = json.loads(raw[i]).get(field)
                    vals[i] = str(v) if isinstance(v, int) else None
                except (ValueError, AttributeError):
                    vals[i] = None
        fast = pa.array(vals, type=pa.string())
    return pc.cast(fast, pa.int64())


def props_value_stats(events: "ray.data.Dataset") -> pd.DataFrame:
    """Grouped stats over a JSON property — per event_type count/sum/
    min/max of ``props.k`` — exercising the vectorized JSON field
    extractor inside the standard combiner-before-merge shape (only
    (event_type, partials) rows ever move)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        k = extract_json_int_field(batch.column("props"), "k")
        df = pa.table({"event_type": batch.column("event_type"),
                       "k": k}).to_pandas()
        agg = df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), k_sum=("k", "sum"),
            k_min=("k", "min"), k_max=("k", "max"))
        for c in ("k_sum", "k_min", "k_max"):
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(
        events.select_columns(["event_type", "props"]), partials,
        ["event_type"],
        {"n_events": "sum", "k_sum": "sum", "k_min": "min",
         "k_max": "max"}, exact_int_cols=["k_sum"])
    out["k_sum"] = out["k_sum"].astype("int64")
    return out


def _promo_revenue_shuffle(lineitem: "ray.data.Dataset",
                           part: "ray.data.Dataset",
                           num_partitions: int = 16) -> pd.DataFrame:
    """Shuffle-join fallback for :func:`promo_revenue_by_type` when the
    part dimension outgrows worker heaps (VERDICT r04 #1): hash join
    lineitem ⋈ part on partkey (both sides repartitioned), then the
    standard combiner-before-merge grouped sum — same exact int64
    1e-4-dollar math, same output, dual-path identity tested with a
    forced broadcast_limit=0."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    li = lineitem.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"]) \
        .repartition(num_partitions)
    pt = part.select_columns(["p_partkey", "p_type"]) \
        .repartition(num_partitions)
    full = li.join(pt, join_type="inner",
                   num_partitions=num_partitions,
                   on=("l_partkey",), right_on=("p_partkey",))

    def partials(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount"))))
        df = pa.table({"p_type": batch.column("p_type"),
                       "revenue_c4": revenue}).to_pandas()
        agg = df.groupby("p_type", as_index=False).agg(
            revenue_c4=("revenue_c4", "sum"),
            n_items=("revenue_c4", "size"))
        agg["revenue_c4"] = agg["revenue_c4"].astype("int64")
        agg["n_items"] = agg["n_items"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials, ["p_type"],
                             {"revenue_c4": "sum", "n_items": "sum"},
                             exact_int_cols=["revenue_c4"])
    if out.empty:
        return pd.DataFrame({"p_type": pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64"),
                             "n_items": pd.Series(dtype="int64")})
    out["revenue"] = [int(x) / 1e4 for x in out["revenue_c4"]]
    out["n_items"] = out["n_items"].astype("int64")
    return (out[["p_type", "revenue", "n_items"]]
            .sort_values("p_type").reset_index(drop=True))


def promo_revenue_by_type(lineitem: "ray.data.Dataset",
                          part: "ray.data.Dataset",
                          broadcast_limit: int = 5_000_000,
                          num_partitions: int = 16
                          ) -> pd.DataFrame:
    """TPC-H Q14-shaped promo share: per part TYPE, how much discounted
    revenue came through it.  Dimension-table pattern: the part table
    (p_partkey → p_type) broadcasts via ``ray.put`` once and each
    lineitem batch maps partkey→type locally — no shuffle; above
    ``broadcast_limit`` rows it cuts over to the hash shuffle join
    (:func:`_promo_revenue_shuffle`, same cut-over contract as
    :func:`revenue_by_segment`) instead of ballooning worker heaps.

    Revenue stays exact int64 1e-4 dollars (cents × (100−bp)); the
    float division to dollars happens once on the driver, so the DuckDB
    oracle compares exactly."""
    import ray

    if part.count() > broadcast_limit:
        return _promo_revenue_shuffle(lineitem, part,
                                      num_partitions=num_partitions)

    pd_df = part.select_columns(["p_partkey", "p_type"]).to_pandas()
    part_ref = ray.put(pd_df)

    def join_type(batch: pa.Table, _cache={}) -> pa.Table:
        pt = _cache.get(part_ref)
        if pt is None:
            _cache.clear()
            pt = _cache[part_ref] = ray.get(part_ref)
        revenue = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100), _cents(batch.column("l_discount"))))
        df = pa.table({"l_partkey": batch.column("l_partkey"),
                       "revenue": revenue}).to_pandas()
        joined = df.merge(pt, left_on="l_partkey", right_on="p_partkey",
                          how="inner")
        agg = joined.groupby("p_type", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    partials = lineitem.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(join_type, batch_format="pyarrow").to_pandas()
    grouped = partials.groupby("p_type", as_index=False)
    out = grouped.agg(n_items=("n_items", "sum"))
    sums = grouped["revenue"].apply(lambda s: sum(int(x) for x in s))
    out["revenue"] = (sums["revenue"] / 1e4).astype("float64")
    out = out[["p_type", "revenue", "n_items"]]
    return out.sort_values("p_type").reset_index(drop=True)


def weekly_active_users(events: "ray.data.Dataset",
                        num_partitions: int = 8) -> pd.DataFrame:
    """COUNT(DISTINCT user) per tumbling 7-day window — the two-level
    distinct shape: batches combine to distinct (week, user) pairs, the
    distributed groupby collapses duplicates across batches, and the
    final per-week count is a combiner again.  Only (week, user) pairs
    ever move, never events."""
    from ray.data.aggregate import Count

    from gruut_ray.pipelines.agg_util import partial_then_merge

    week_us = 7 * 86_400_000_000

    def pair_partials(batch: pa.Table) -> pa.Table:
        ts = _us(batch.column("ts")).to_numpy(zero_copy_only=False)
        uid = pc.cast(batch.column("user_id"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        week = np.floor_divide(ts, week_us)
        df = pd.DataFrame({"week": week, "user_id": uid}) \
            .drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    pairs = (events.select_columns(["ts", "user_id"])
             .map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["week", "user_id"])
             .aggregate(Count(alias_name="n"))
             .repartition(num_partitions))

    def week_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"week": pa.array([], type=pa.int64()),
                             "wau": pa.array([], type=pa.int64())})
        df = pa.table({"week": pc.cast(batch.column("week"),
                                       pa.int64())}).to_pandas()
        agg = df.groupby("week", as_index=False).size() \
            .rename(columns={"size": "wau"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(pairs, week_partials, ["week"],
                             {"wau": "sum"})
    out["week"] = out["week"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    return out


def customers_with_orders(customer: "ray.data.Dataset",
                          orders: "ray.data.Dataset",
                          num_partitions: int = 8) -> pd.DataFrame:
    """Dual of :func:`customers_without_orders` through the RIGHT SEMI
    join (orders ⋈ customer keeping matching customer rows) — completes
    the join-type inventory's semi/anti pairs in both directions.  Same
    scale shape: orders reduce to distinct custkeys per batch before
    the join, and the result collapses to (count, checksum) witnesses."""

    def distinct_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(batch.column("o_custkey"))})

    keys = (orders.select_columns(["o_custkey"])
            .map_batches(distinct_keys, batch_format="pyarrow")
            .repartition(num_partitions))
    cust = customer.select_columns(["c_custkey"]) \
        .repartition(num_partitions)
    semi = keys.join(cust, join_type="right_semi",
                     num_partitions=num_partitions,
                     on=("o_custkey",), right_on=("c_custkey",))

    def partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey")
        return pa.table({
            "n_customers": pa.array([batch.num_rows], type=pa.int64()),
            "custkey_sum": pa.array(
                [pc.sum(pc.cast(ck, pa.int64())).as_py() or 0],
                type=pa.int64()),
        })

    parts = semi.map_batches(partials, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"n_customers": [0], "custkey_sum": [0]})
    return pd.DataFrame({
        "n_customers": [int(parts["n_customers"].sum())],
        "custkey_sum": [int(parts["custkey_sum"].sum())],
    })


def small_quantity_revenue(lineitem: "ray.data.Dataset",
                           part: "ray.data.Dataset",
                           brand: str = "Brand#1",
                           ) -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity, for one brand.

    Scale shape — the correlated-average subquery becomes a broadcast
    aggregate + re-scan (two passes, zero shuffles): pass 1 reduces
    lineitem to (partkey, sum_qty, n) partials for the brand's partkeys
    (a tiny broadcast set); the per-part averages broadcast back via
    ``ray.put``; pass 2 filters map-side with the EXACT integer
    predicate ``qty_c × 5 × n < sum_qty_c`` (⇔ qty < 0.2·avg, no float
    division on either side) and sums revenue.  The avg map is bounded
    by the brand's part count (≤ |part| / ~25 brands), far under
    broadcast limits at any TPC-H scale."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    pf = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_brand"),
                                    pa.scalar(brand)))
        .select(["p_partkey"]),
        batch_format="pyarrow").to_pandas()
    keys = pa.array(sorted(pf["p_partkey"].astype("int64")),
                    type=pa.int64())

    def qty_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("l_partkey"),
                                      value_set=keys))
        tbl = pa.table({
            "l_partkey": batch.column("l_partkey"),
            "sum_qty_c": _cents(batch.column("l_quantity")),
        }).to_pandas()
        agg = tbl.groupby("l_partkey", as_index=False).agg(
            sum_qty_c=("sum_qty_c", "sum"), n=("sum_qty_c", "size"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    li = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice"])
    stats = partial_then_merge(li, qty_partials, ["l_partkey"],
                               {"sum_qty_c": "sum", "n": "sum"})
    # broadcast as sorted arrays: np.searchsorted lookups beat a dict
    # probe per batch (memory note: broadcast sorted-array + searchsorted)
    stats = stats.sort_values("l_partkey")
    avg_ref = ray.put((stats["l_partkey"].to_numpy(dtype=np.int64),
                       stats["sum_qty_c"].to_numpy(dtype=np.int64),
                       stats["n"].to_numpy(dtype=np.int64)))

    def pick(batch: pa.Table, _cache={}) -> pa.Table:
        m = _cache.get(avg_ref)
        if m is None:
            _cache.clear()
            m = _cache[avg_ref] = ray.get(avg_ref)
        keys, sums, ns = m
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = _cents(batch.column("l_quantity")) \
            .to_numpy(zero_copy_only=False)
        base = _cents(batch.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pk)
        pos_c = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        hit = (len(keys) > 0) & (keys[pos_c] == pk) if len(keys) \
            else np.zeros(len(pk), dtype=bool)
        # exact integer predicate: qty < 0.2·avg ⇔ qty_c·5·n < sum_qty_c
        ok = hit & (qty * 5 * ns[pos_c] < sums[pos_c])
        return pa.table({
            "n_lines": pa.array([int(ok.sum())], type=pa.int64()),
            "sum_extprice_c": pa.array([int(base[ok].sum())],
                                       type=pa.int64()),
        })

    parts = li.map_batches(pick, batch_format="pyarrow").to_pandas()
    # Python-int merge: exact past int64 at extreme scale (same
    # discipline as partial_then_merge's exact_int_cols)
    return pd.DataFrame({
        "n_lines": [int(parts["n_lines"].sum()) if len(parts) else 0],
        "sum_extprice_c": [sum(int(x) for x in parts["sum_extprice_c"])],
    })


def disjunctive_brand_revenue(lineitem: "ray.data.Dataset",
                              part: "ray.data.Dataset") -> pd.DataFrame:
    """TPC-H Q19 shape (adapted to this schema: no container column):
    revenue under an OR of per-brand (size-range AND quantity-range)
    conjunctions.

    Scale shape: the part-side disjuncts evaluate VECTORIZED once over
    the part table, collapsing to a partkey → bracket-id map broadcast
    via ``ray.put``; each lineitem batch then applies its bracket's
    quantity range map-side.  The whole disjunction costs one broadcast
    and one scan — no join, no shuffle."""
    import ray

    # (brand, size_lo, size_hi, qty_lo_c, qty_hi_c)
    brackets = [("Brand#1", 1, 15, 100, 3000),
                ("Brand#2", 10, 30, 1000, 5000),
                ("Brand#3", 20, 50, 2000, 6000)]

    def part_map(batch: pa.Table) -> pa.Table:
        brand = batch.column("p_brand")
        size = batch.column("p_size")
        bid = np.full(batch.num_rows, -1, dtype=np.int64)
        for i, (b, lo, hi, _, _) in enumerate(brackets):
            mask = pc.and_(pc.equal(brand, pa.scalar(b)),
                           pc.and_(pc.greater_equal(size, pa.scalar(lo)),
                                   pc.less_equal(size, pa.scalar(hi))))
            bid[mask.to_numpy(zero_copy_only=False)] = i
        keep = bid >= 0
        return pa.table({
            "p_partkey": batch.column("p_partkey").filter(
                pa.array(keep)),
            "bracket": pa.array(bid[keep], type=pa.int64()),
        })

    pm = part.select_columns(["p_partkey", "p_brand", "p_size"]) \
        .map_batches(part_map, batch_format="pyarrow").to_pandas()
    if pm.empty:  # all blocks filtered empty -> schema-less frame
        pm = pd.DataFrame({"p_partkey": np.array([], np.int64),
                           "bracket": np.array([], np.int64)})
    pm = pm.sort_values("p_partkey")
    qty_lo = np.asarray([b[3] for b in brackets], dtype=np.int64)
    qty_hi = np.asarray([b[4] for b in brackets], dtype=np.int64)
    map_ref = ray.put((pm["p_partkey"].to_numpy(dtype=np.int64),
                       pm["bracket"].to_numpy(dtype=np.int64)))

    def pick(batch: pa.Table, _cache={}) -> pa.Table:
        m = _cache.get(map_ref)
        if m is None:
            _cache.clear()
            m = _cache[map_ref] = ray.get(map_ref)
        keys, bid = m
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = _cents(batch.column("l_quantity")) \
            .to_numpy(zero_copy_only=False)
        rev = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount")))) \
            .to_numpy(zero_copy_only=False)
        if len(keys):
            pos = np.searchsorted(keys, pk)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = keys[pos_c] == pk
            b = bid[pos_c]
            ok = hit & (qty >= qty_lo[b]) & (qty <= qty_hi[b])
        else:
            ok = np.zeros(len(pk), dtype=bool)
        return pa.table({
            "n_items": pa.array([int(ok.sum())], type=pa.int64()),
            "revenue_c4": pa.array([int(rev[ok].sum())],
                                   type=pa.int64()),
        })

    parts = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(pick, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_items": [int(parts["n_items"].sum()) if len(parts) else 0],
        "revenue_c4": [sum(int(x) for x in parts["revenue_c4"])],
    })


def idle_customer_balance(customer: "ray.data.Dataset",
                          orders: "ray.data.Dataset",
                          nationkeys: typing.Sequence[int] = (0, 1, 2, 3),
                          max_orders: int = 5,
                          num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q22 shape (adapted: nationkey set instead of phone country
    codes, and "fewer than ``max_orders`` orders" instead of "no orders"
    — every synthetic customer has at least one): customers from the
    given nations with an account balance above the positive-balance
    average of the group and below-threshold engagement; per-nation
    count and exact balance sum.

    Scale shape: pass 1 is a GLOBAL scalar aggregate (sum, count of
    positive balances) — two int64s broadcast by value; pass 2 filters
    customers with the EXACT integer predicate ``acctbal_c × n >
    sum_c`` and LEFT-ANTI-joins the set of custkeys holding ≥
    ``max_orders`` orders (per-batch count combiner → custkey groupby —
    build side bounded by |customers| regardless of order count)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    nk = pa.array(sorted(int(k) for k in nationkeys), type=pa.int64())

    def bal_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("c_nationkey"),
                                      value_set=nk))
        bal = _cents(batch.column("c_acctbal"))
        pos = pc.greater(bal, pa.scalar(0))
        bal_pos = bal.filter(pos)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "sum_c": pa.array([pc.sum(bal_pos).as_py() or 0],
                              type=pa.int64()),
            "n": pa.array([len(bal_pos)], type=pa.int64()),
        })

    cust_cols = customer.select_columns(
        ["c_custkey", "c_nationkey", "c_acctbal"])
    g = partial_then_merge(cust_cols, bal_partials, ["g"],
                           {"sum_c": "sum", "n": "sum"})
    sum_c, n = (int(g["sum_c"][0]), int(g["n"][0])) if len(g) else (0, 0)
    if n == 0:
        return pd.DataFrame(columns=["c_nationkey", "n_customers",
                                     "acctbal_c_sum"])

    def rich(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("c_nationkey"),
                                      value_set=nk))
        bal = _cents(batch.column("c_acctbal"))
        keep = pc.greater(pc.multiply(bal, pa.scalar(n)),
                          pa.scalar(sum_c))
        batch = batch.append_column("acctbal_c", bal)
        return batch.filter(keep)

    cand = (cust_cols.map_batches(rich, batch_format="pyarrow")
            .repartition(num_partitions))
    if cand.count() == 0:
        return pd.DataFrame(columns=["c_nationkey", "n_customers",
                                     "acctbal_c_sum"])

    from ray.data.aggregate import Sum

    def count_partials(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch.column("o_custkey").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"o_custkey": pa.array(keys, type=pa.int64()),
                         "n_orders": pa.array(counts, type=pa.int64())})

    busy = (orders.select_columns(["o_custkey"])
            .map_batches(count_partials, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(Sum("n_orders", alias_name="n_orders"))
            .map_batches(
                lambda b: b.filter(pc.greater_equal(
                    b.column("n_orders"),
                    pa.scalar(max_orders))).select(["o_custkey"]),
                batch_format="pyarrow")
            .repartition(num_partitions))
    anti = cand.join(busy, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))

    def out_partials(batch: pa.Table) -> pa.Table:
        tbl = pa.table({
            "c_nationkey": batch.column("c_nationkey"),
            "acctbal_c_sum": batch.column("acctbal_c"),
        }).to_pandas()
        agg = tbl.groupby("c_nationkey", as_index=False).agg(
            n_customers=("acctbal_c_sum", "size"),
            acctbal_c_sum=("acctbal_c_sum", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(anti, out_partials, ["c_nationkey"],
                             {"n_customers": "sum",
                              "acctbal_c_sum": "sum"},
                             exact_int_cols=["acctbal_c_sum"])
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    out["acctbal_c_sum"] = out["acctbal_c_sum"].astype("int64")
    return out


def volume_shipping(lineitem: "ray.data.Dataset",
                    orders: "ray.data.Dataset",
                    customer: "ray.data.Dataset",
                    supplier: "ray.data.Dataset",
                    nation: "ray.data.Dataset",
                    nation_a: str = "NATION_0",
                    nation_b: str = "NATION_1",
                    date_lo: str = "1996-01-01",
                    date_hi: str = "1998-01-01",
                    num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q7 shape: shipped-revenue flow between two nations per
    (supplier nation, customer nation, ship year).

    Scale shape (same two-shuffle skeleton as :func:`regional_revenue`):
    nation collapses driver-side to a two-key dict; the supplier side
    becomes a suppkey→nationkey broadcast map; nation-filtered customer
    shuffle-joins orders on custkey, ship-date-filtered lineitem
    shuffle-joins that on orderkey; the cross-nation predicate
    (supp_nation ≠ cust_nation, both in the pair) evaluates map-side
    against the broadcast, and only (supp_nation, cust_nation, year)
    partial sums leave the final scan.  Exact fixed-point revenue."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    nat = nation.to_pandas()
    nat = nat[nat["n_name"].isin([nation_a, nation_b])]
    names = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    nation_keys = pa.array(sorted(names), type=pa.int64())

    supp = supplier.map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_nationkey"),
                                    value_set=nation_keys))
        .select(["s_suppkey", "s_nationkey"]),
        batch_format="pyarrow").to_pandas()
    if supp.empty:  # all blocks filtered empty -> schema-less frame
        supp = pd.DataFrame({"s_suppkey": np.array([], np.int64),
                             "s_nationkey": np.array([], np.int64)})
    supp = supp.sort_values("s_suppkey")
    supp_ref = ray.put((supp["s_suppkey"].to_numpy(dtype=np.int64),
                        supp["s_nationkey"].to_numpy(dtype=np.int64)))

    c = (customer.map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_nationkey"),
                                    value_set=nation_keys))
        .select(["c_custkey", "c_nationkey"]),
        batch_format="pyarrow")
        .repartition(num_partitions))
    o = (orders.select_columns(["o_orderkey", "o_custkey"])
         .repartition(num_partitions))
    if c.count() == 0:
        return pd.DataFrame(columns=["supp_nation", "cust_nation",
                                     "l_year", "revenue_c4", "n_items"])
    oc = (o.join(c, join_type="inner", num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))
          .select_columns(["o_orderkey", "c_nationkey"])
          .repartition(num_partitions)
          .materialize())  # single live hash-join plan (see regional_revenue)

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))
    li = (lineitem.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi)))
        .select(["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"]),
        batch_format="pyarrow")
        .repartition(num_partitions))
    full = li.join(oc, join_type="inner", num_partitions=num_partitions,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    def partials(batch: pa.Table, _cache={}) -> pa.Table:
        m = _cache.get(supp_ref)
        if m is None:
            _cache.clear()
            m = _cache[supp_ref] = ray.get(supp_ref)
        keys, nats = m
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            hit = np.zeros(len(sk), dtype=bool)
            sn = np.zeros(len(sk), dtype=np.int64)
        else:
            pos = np.minimum(np.searchsorted(keys, sk), len(keys) - 1)
            hit = keys[pos] == sk
            sn = nats[pos]
        cross = hit & (sn != cn)  # both nations in-pair by construction
        if not cross.any():
            return pa.table({
                "supp_nat": pa.array([], type=pa.int64()),
                "cust_nat": pa.array([], type=pa.int64()),
                "l_year": pa.array([], type=pa.int64()),
                "revenue_c4": pa.array([], type=pa.int64()),
                "n_items": pa.array([], type=pa.int64())})
        rev = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount")))) \
            .to_numpy(zero_copy_only=False)
        year = batch.column("l_shipdate").to_pandas().dt.year.to_numpy()
        df = pd.DataFrame({
            "supp_nat": sn[cross], "cust_nat": cn[cross],
            "l_year": year[cross].astype(np.int64),
            "revenue_c4": rev[cross], "n_items": 1})
        agg = df.groupby(["supp_nat", "cust_nat", "l_year"],
                         as_index=False).agg(
            revenue_c4=("revenue_c4", "sum"), n_items=("n_items", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials,
                             ["supp_nat", "cust_nat", "l_year"],
                             {"revenue_c4": "sum", "n_items": "sum"},
                             exact_int_cols=["revenue_c4"])
    if out.empty:
        return pd.DataFrame(columns=["supp_nation", "cust_nation",
                                     "l_year", "revenue_c4", "n_items"])
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["cust_nat"].map(names)
    out["l_year"] = out["l_year"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out["revenue_c4"] = [int(x) for x in out["revenue_c4"]]
    return (out[["supp_nation", "cust_nation", "l_year", "revenue_c4",
                 "n_items"]]
            .sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


def _product_profit_tail(out: pd.DataFrame,
                         nation: "ray.data.Dataset") -> pd.DataFrame:
    """Shared finisher: map nation names onto the (s_nationkey, o_year)
    partial sums and fix dtypes/ordering (nation is 25 rows — a
    driver-side lookup by construction)."""
    if out.empty:
        return pd.DataFrame(columns=["n_name", "o_year", "profit_c4",
                                     "n_items"])
    names = nation.to_pandas()
    out = out.merge(names[["n_nationkey", "n_name"]],
                    left_on="s_nationkey", right_on="n_nationkey")
    out["o_year"] = out["o_year"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out["profit_c4"] = [int(x) for x in out["profit_c4"]]
    return (out[["n_name", "o_year", "profit_c4", "n_items"]]
            .sort_values(["n_name", "o_year"]).reset_index(drop=True))


def _product_profit_shuffle(lineitem: "ray.data.Dataset",
                            orders: "ray.data.Dataset",
                            part_filtered: "ray.data.Dataset",
                            supplier: "ray.data.Dataset",
                            nation: "ray.data.Dataset",
                            num_partitions: int = 16) -> pd.DataFrame:
    """Shuffle-join fallback for :func:`product_profit` when a
    dimension outgrows worker heaps (VERDICT r04 #1): the (filtered)
    part and supplier tables join by hash shuffle instead of
    broadcasting — lineitem ⋈ orders on orderkey, ⋈ part on partkey,
    ⋈ supplier on suppkey, then the same exact-int partials.  Output
    is identical to the broadcast path (dual-path identity tested with
    a forced broadcast_limit=0); ``part_filtered`` is already
    restricted to the type and projected to (p_partkey,
    p_retailprice)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    np_ = num_partitions
    li = (lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"]).repartition(np_))
    o = (orders.select_columns(["o_orderkey", "o_orderdate"])
         .repartition(np_))
    # materialize() between joins: each hash-shuffle join reserves a
    # pool of aggregator actors for the WHOLE plan's lifetime, so three
    # chained joins in one streaming plan over-subscribe the fixed CPU
    # reservation (3 × num_partitions × per-aggregator cpus can exceed
    # the cluster) and the plan deadlocks waiting on pending actors —
    # one join pool alive at a time is the scale-safe shape
    full = li.join(o, join_type="inner", num_partitions=np_,
                   on=("l_orderkey",), right_on=("o_orderkey",)) \
        .materialize()
    pt = part_filtered.repartition(np_)  # merge filtered-empty blocks
    full = full.repartition(np_).join(
        pt, join_type="inner", num_partitions=np_,
        on=("l_partkey",), right_on=("p_partkey",)).materialize()
    sp = supplier.select_columns(["s_suppkey", "s_nationkey"]) \
        .repartition(np_)
    full = full.repartition(np_).join(
        sp, join_type="inner", num_partitions=np_,
        on=("l_suppkey",), right_on=("s_suppkey",))

    def partials(batch: pa.Table) -> pa.Table:
        base = _cents(batch.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(batch.column("l_discount")) \
            .to_numpy(zero_copy_only=False)
        qty = _cents(batch.column("l_quantity")) \
            .to_numpy(zero_copy_only=False)
        retail = np.rint(batch.column("p_retailprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        year = batch.column("o_orderdate").to_pandas().dt.year.to_numpy()
        profit = base * (100 - disc) - retail * qty
        df = pd.DataFrame({
            "s_nationkey": batch.column("s_nationkey")
            .to_numpy(zero_copy_only=False),
            "o_year": year.astype(np.int64),
            "profit_c4": profit,
            "n_items": 1})
        agg = df.groupby(["s_nationkey", "o_year"], as_index=False).agg(
            profit_c4=("profit_c4", "sum"), n_items=("n_items", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials, ["s_nationkey", "o_year"],
                             {"profit_c4": "sum", "n_items": "sum"},
                             exact_int_cols=["profit_c4"])
    return _product_profit_tail(out, nation)


def product_profit(lineitem: "ray.data.Dataset",
                   orders: "ray.data.Dataset",
                   part: "ray.data.Dataset",
                   supplier: "ray.data.Dataset",
                   nation: "ray.data.Dataset",
                   type_filter: str = "PROMO",
                   num_partitions: int = 16,
                   broadcast_limit: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table — p_retailprice is the
    unit cost): profit per supplier nation and order year for parts of
    one type, profit = extprice·(1−disc) − retailprice·quantity, exact
    1e-4-dollar integers end to end.

    Scale shape: part collapses to a (partkey → retail_c) broadcast map
    (filtered to the type: ~1/6 of part) and supplier to a (suppkey →
    nationkey) broadcast map; the ONLY shuffle is lineitem ⋈ orders on
    orderkey for the order year.  Past ``broadcast_limit`` either
    dimension cuts over to hash shuffle joins
    (:func:`_product_profit_shuffle`) instead of ballooning worker
    heaps — the filtered-part count is taken on the DATASET, so the
    driver never pulls an over-limit dimension."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    pm_ds = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"),
                                    pa.scalar(type_filter)))
        .select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow").materialize()
    if pm_ds.count() > broadcast_limit \
            or supplier.count() > broadcast_limit:
        return _product_profit_shuffle(
            lineitem, orders, pm_ds, supplier, nation,
            num_partitions=num_partitions)
    pm = pm_ds.to_pandas()
    if pm.empty:  # all blocks filtered empty -> schema-less frame
        pm = pd.DataFrame({"p_partkey": np.array([], np.int64),
                           "p_retailprice": np.array([], np.float64)})
    pm = pm.sort_values("p_partkey")
    sm = supplier.select_columns(["s_suppkey", "s_nationkey"]) \
        .to_pandas().sort_values("s_suppkey")
    part_ref = ray.put((pm["p_partkey"].to_numpy(dtype=np.int64),
                        np.rint(pm["p_retailprice"].to_numpy() * 100)
                        .astype(np.int64)))
    supp_ref = ray.put((sm["s_suppkey"].to_numpy(dtype=np.int64),
                        sm["s_nationkey"].to_numpy(dtype=np.int64)))

    li = (lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"])
        .repartition(num_partitions))
    o = (orders.select_columns(["o_orderkey", "o_orderdate"])
         .repartition(num_partitions))
    full = li.join(o, join_type="inner", num_partitions=num_partitions,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    def partials(batch: pa.Table, _cache={}) -> pa.Table:
        m = _cache.get(part_ref)
        if m is None:
            _cache.clear()
            m = _cache[part_ref] = (ray.get(part_ref), ray.get(supp_ref))
        (pkeys, retail), (skeys, nats) = m
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(pkeys, pk),
                         max(len(pkeys) - 1, 0))
        hit = (pkeys[pos] == pk) if len(pkeys) else \
            np.zeros(len(pk), dtype=bool)
        if not hit.any():
            return pa.table({
                "s_nationkey": pa.array([], type=pa.int64()),
                "o_year": pa.array([], type=pa.int64()),
                "profit_c4": pa.array([], type=pa.int64()),
                "n_items": pa.array([], type=pa.int64())})
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        spos = np.minimum(np.searchsorted(skeys, sk), len(skeys) - 1)
        base = _cents(batch.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(batch.column("l_discount")) \
            .to_numpy(zero_copy_only=False)
        qty = _cents(batch.column("l_quantity")) \
            .to_numpy(zero_copy_only=False)
        year = batch.column("o_orderdate").to_pandas().dt.year.to_numpy()
        profit = base * (100 - disc) - retail[pos] * qty
        df = pd.DataFrame({
            "s_nationkey": nats[spos][hit],
            "o_year": year[hit].astype(np.int64),
            "profit_c4": profit[hit],
            "n_items": 1})
        agg = df.groupby(["s_nationkey", "o_year"], as_index=False).agg(
            profit_c4=("profit_c4", "sum"), n_items=("n_items", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials, ["s_nationkey", "o_year"],
                             {"profit_c4": "sum", "n_items": "sum"},
                             exact_int_cols=["profit_c4"])
    return _product_profit_tail(out, nation)


def top_supplier_revenue(lineitem: "ray.data.Dataset",
                         supplier: "ray.data.Dataset",
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01") -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue in
    one quarter (the revenue "view" + global max, ties included).

    Scale shape: one filtered lineitem scan emits (suppkey, revenue)
    combiner partials; the groupby-sum table is bounded by |supplier|
    (partial_then_merge shrinks distributedly past its driver limit);
    the global max and tie filter run on that reduced table; winner
    names come from a broadcast-key filtered supplier scan (the winner
    set is ~1 row)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def rev_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less(batch.column("l_shipdate"), hi)))
        rev = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount"))))
        tbl = pa.table({"l_suppkey": batch.column("l_suppkey"),
                        "total_revenue_c4": rev}).to_pandas()
        agg = tbl.groupby("l_suppkey", as_index=False).agg(
            total_revenue_c4=("total_revenue_c4", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    li = lineitem.select_columns(
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
    rev = partial_then_merge(li, rev_partials, ["l_suppkey"],
                             {"total_revenue_c4": "sum"},
                             exact_int_cols=["total_revenue_c4"])
    if rev.empty:
        return pd.DataFrame(columns=["s_suppkey", "s_name",
                                     "total_revenue_c4"])
    best = max(int(x) for x in rev["total_revenue_c4"])
    winners = rev[[int(x) == best for x in rev["total_revenue_c4"]]]
    keys = pa.array(sorted(winners["l_suppkey"].astype("int64")),
                    type=pa.int64())
    names = supplier.map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_suppkey"),
                                    value_set=keys))
        .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow").to_pandas()
    if names.empty:  # winner keys absent from supplier (or empty blocks)
        names = pd.DataFrame({"s_suppkey": np.array([], np.int64),
                              "s_name": np.array([], object)})
    out = names.merge(winners.rename(columns={"l_suppkey": "s_suppkey"}),
                      on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_revenue_c4"] = [int(x) for x in out["total_revenue_c4"]]
    return (out[["s_suppkey", "s_name", "total_revenue_c4"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def sole_late_supplier(lineitem: "ray.data.Dataset",
                       orders: "ray.data.Dataset",
                       late_days: int = 60, k: int = 10,
                       num_partitions: int = 16,
                       driver_limit: int = 5_000_000) -> pd.DataFrame:
    """TPC-H Q21 shape (adapted to this schema: ship-delay vs order
    date replaces commit/receipt dates): count, per supplier, the
    multi-supplier orders where that supplier was the ONLY late one —
    the grouped multi-row predicate family (EXISTS + NOT EXISTS over
    sibling rows).  Top-k by count.

    Scale shape: lineitem shuffle-joins orders on orderkey (the join
    already co-locates keys); a keyed repartition then guarantees each
    orderkey sits in one block (join output blocks can split), and a
    single pandas kernel per block evaluates the per-order predicate
    for every order at once.  Only (suppkey, n) partials leave the
    blocks; below ``driver_limit`` joined rows the whole analysis runs
    driver-side (same cut-over contract as event_gap_histogram, both
    paths output-identical)."""

    li = lineitem.select_columns(["l_orderkey", "l_suppkey",
                                  "l_shipdate"]) \
        .repartition(num_partitions)
    o = orders.select_columns(["o_orderkey", "o_orderdate"]) \
        .repartition(num_partitions)
    joined = li.join(o, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    late_us = np.int64(late_days) * 86_400_000_000

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"s_suppkey": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        ship = df["l_shipdate"].astype("int64").to_numpy()
        od = df["o_orderdate"].astype("int64").to_numpy()
        late = ship > od + late_us
        g = pd.DataFrame({"ok": df["l_orderkey"].to_numpy(),
                          "sk": df["l_suppkey"].to_numpy(),
                          "late": late})
        per = g.groupby("ok").agg(
            n_supp=("sk", "nunique"),
            n_late_rows=("late", "sum"))
        lg = g[g["late"]].groupby("ok").agg(
            n_late_supp=("sk", "nunique"), late_sk=("sk", "max"))
        per = per.join(lg, how="left")
        sole = per[(per["n_supp"] >= 2) & (per["n_late_supp"] == 1)]
        out = (sole.groupby("late_sk").size()
               .rename("n").reset_index()
               .rename(columns={"late_sk": "s_suppkey"}))
        out["s_suppkey"] = out["s_suppkey"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    if lineitem.count() <= driver_limit:
        parts = block_counts(joined.to_pandas())
    else:
        from ray.data.context import ShuffleStrategy

        prev = joined.context.shuffle_strategy
        joined.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            parts = (joined.repartition(num_partitions,
                                        keys=["l_orderkey"])
                     .map_batches(block_counts, batch_format="pandas",
                                  batch_size=None)
                     .to_pandas())
        finally:
            joined.context.shuffle_strategy = prev
        if not parts.empty:
            parts = parts.groupby("s_suppkey", as_index=False)["n"].sum()
    if parts.empty:
        return pd.DataFrame(columns=["s_suppkey", "n_waiting_orders"])
    out = parts.rename(columns={"n": "n_waiting_orders"})
    out = out.sort_values(["n_waiting_orders", "s_suppkey"],
                          ascending=[False, True]).head(k)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["n_waiting_orders"] = out["n_waiting_orders"].astype("int64")
    return out.reset_index(drop=True)


def forecast_revenue_change(lineitem: "ray.data.Dataset",
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1997-01-01",
                            disc_lo_bp: int = 5, disc_hi_bp: int = 7,
                            max_qty_c: int = 2400) -> pd.DataFrame:
    """TPC-H Q6 shape: pure filter + scalar aggregate — the
    simplest-possible plan (one scan, combiner partials, no shuffle,
    no join).  revenue = Σ extprice·discount over the date/discount/
    quantity window, exact 1e-4-dollar integers."""

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less(batch.column("l_shipdate"), hi)))
        disc = _cents(batch.column("l_discount"))
        qty = _cents(batch.column("l_quantity"))
        keep = pc.and_(
            pc.and_(pc.greater_equal(disc, pa.scalar(disc_lo_bp)),
                    pc.less_equal(disc, pa.scalar(disc_hi_bp))),
            pc.less(qty, pa.scalar(max_qty_c)))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table({"revenue_c4": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        rev = pc.multiply(_cents(batch.column("l_extendedprice")),
                          _cents(batch.column("l_discount")))
        return pa.table({
            "revenue_c4": pa.array([pc.sum(rev).as_py() or 0],
                                   type=pa.int64()),
            "n_items": pa.array([batch.num_rows], type=pa.int64()),
        })

    parts = lineitem.select_columns(
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]) \
        .map_batches(partials, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_c4": [sum(int(x) for x in parts["revenue_c4"])
                       if len(parts) else 0],
        "n_items": [int(parts["n_items"].sum()) if len(parts) else 0],
    })


def market_share(lineitem: "ray.data.Dataset",
                 orders: "ray.data.Dataset",
                 customer: "ray.data.Dataset",
                 supplier: "ray.data.Dataset",
                 nation: "ray.data.Dataset",
                 region: "ray.data.Dataset",
                 target_nation: str = "NATION_0",
                 region_name: str = "ASIA",
                 part: typing.Optional["ray.data.Dataset"] = None,
                 part_type: str = "PROMO",
                 num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q8 shape: the target nation's share of a region's market
    per order year, reported as EXACT integer numerator/denominator
    (nation_revenue_c4, total_revenue_c4) so the oracle hash-matches
    without float-ratio noise.

    Scale shape (Q5/Q7 skeleton): region⋈nation collapse driver-side,
    supplier → suppkey→nationkey broadcast, optional part-type filter
    → partkey set broadcast, region-filtered customer⋈orders then
    lineitem⋈oc shuffles; per (year) partials carry both the total and
    the target nation's slice out of the same scan."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    rk = region.to_pandas()
    rkeys = set(rk.loc[rk["r_name"] == region_name, "r_regionkey"])
    nat = nation.to_pandas()
    in_region = nat[nat["n_regionkey"].isin(rkeys)]
    region_nation_keys = pa.array(
        sorted(in_region["n_nationkey"].astype("int64")), type=pa.int64())
    target_keys = set(nat.loc[nat["n_name"] == target_nation,
                              "n_nationkey"].astype("int64"))

    sm = supplier.select_columns(["s_suppkey", "s_nationkey"]) \
        .to_pandas().sort_values("s_suppkey")
    supp_ref = ray.put((sm["s_suppkey"].to_numpy(dtype=np.int64),
                        sm["s_nationkey"].to_numpy(dtype=np.int64)))

    part_keys_ref = None
    if part is not None:
        pf = part.map_batches(
            lambda b: b.filter(pc.equal(b.column("p_type"),
                                        pa.scalar(part_type)))
            .select(["p_partkey"]), batch_format="pyarrow").to_pandas()
        pk = np.sort(pf["p_partkey"].to_numpy(dtype=np.int64)) \
            if not pf.empty else np.array([], dtype=np.int64)
        part_keys_ref = ray.put(pk)

    c = (customer.map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_nationkey"),
                                    value_set=region_nation_keys))
        .select(["c_custkey"]), batch_format="pyarrow")
        .repartition(num_partitions))
    o = (orders.select_columns(["o_orderkey", "o_custkey",
                                "o_orderdate"])
         .repartition(num_partitions))
    if c.count() == 0:
        return pd.DataFrame(columns=["o_year", "nation_revenue_c4",
                                     "total_revenue_c4", "n_items"])
    oc = (o.join(c, join_type="inner", num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))
          .select_columns(["o_orderkey", "o_orderdate"])
          .repartition(num_partitions)
          .materialize())
    li_cols = ["l_orderkey", "l_suppkey", "l_extendedprice",
               "l_discount"] + (["l_partkey"] if part is not None else [])
    li = lineitem.select_columns(li_cols).repartition(num_partitions)
    full = li.join(oc, join_type="inner", num_partitions=num_partitions,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    tset = np.array(sorted(target_keys), dtype=np.int64)

    def partials(batch: pa.Table, _cache={}) -> pa.Table:
        m = _cache.get(supp_ref)
        if m is None:
            _cache.clear()
            pk = ray.get(part_keys_ref) if part_keys_ref else None
            m = _cache[supp_ref] = (ray.get(supp_ref), pk)
        (skeys, snats), pk = m
        mask = np.ones(batch.num_rows, dtype=bool)
        if pk is not None:
            lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(pk, lpk),
                             max(len(pk) - 1, 0))
            mask &= (pk[pos] == lpk) if len(pk) else False
        if not mask.any():
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "nation_revenue_c4": pa.array([], pa.int64()),
                             "total_revenue_c4": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        spos = np.minimum(np.searchsorted(skeys, sk), len(skeys) - 1)
        snat = snats[spos]
        rev = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount")))) \
            .to_numpy(zero_copy_only=False)
        year = batch.column("o_orderdate").to_pandas().dt.year.to_numpy()
        is_target = np.isin(snat, tset)
        df = pd.DataFrame({
            "o_year": year[mask].astype(np.int64),
            "nation_revenue_c4": np.where(is_target, rev, 0)[mask],
            "total_revenue_c4": rev[mask],
            "n_items": 1})
        agg = df.groupby("o_year", as_index=False).sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(full, partials, ["o_year"],
                             {"nation_revenue_c4": "sum",
                              "total_revenue_c4": "sum",
                              "n_items": "sum"},
                             exact_int_cols=["nation_revenue_c4",
                                             "total_revenue_c4"])
    if out.empty:
        return pd.DataFrame(columns=["o_year", "nation_revenue_c4",
                                     "total_revenue_c4", "n_items"])
    out["o_year"] = out["o_year"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out["nation_revenue_c4"] = [int(x) for x in out["nation_revenue_c4"]]
    out["total_revenue_c4"] = [int(x) for x in out["total_revenue_c4"]]
    return (out[["o_year", "nation_revenue_c4", "total_revenue_c4",
                 "n_items"]]
            .sort_values("o_year").reset_index(drop=True))


def rapid_event_pairs(events: "ray.data.Dataset", window_s: int = 60,
                      num_partitions: int = 32,
                      driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Interval SELF-JOIN family: count same-user event pairs (a, b)
    with ``a.ts < b.ts <= a.ts + window`` — the burst-detection shape a
    naive SQL self-join makes quadratic.

    Scale shape: the join never materializes pairs.  Rows sort by
    (user, ts) per block after a user-keyed repartition; each user's
    timestamps shift by a per-user offset larger than the global time
    span, making the concatenated array globally sorted with windows
    that can never cross users — per-row pair counts are then two
    vectorized searchsorteds (half-open (ts, ts+W] window, so equal-ts
    events never pair, matching the SQL ``b.ts > a.ts``).  Timestamps
    rebase to the block minimum and the shift runs over CHUNKS of at
    most ``2**62 // span`` users, so ``user_idx * span`` can never
    wrap int64 no matter how many distinct users share a block or how
    long the corpus time-range is (ADVICE/VERDICT r04: raw epoch-µs ×
    a year-long span silently wrapped past ~290k users/block).  Only
    (n_pairs, n_users) partials leave each block; driver cut-over below
    ``driver_limit`` rows (dual-path identity tested)."""
    window_us = np.int64(window_s) * 1_000_000

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n_pairs": np.array([], np.int64),
                                 "n_users": np.array([], np.int64)})
        g = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        ts = ts - ts.min()  # rebase: offsets start from the block min
        # per-user offset: windows can never cross user boundaries
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        user_idx = np.cumsum(new_user) - 1
        n_seg = int(user_idx[-1]) + 1
        seg_start = np.flatnonzero(new_user)
        seg_end = np.append(seg_start[1:], len(ts))
        span = np.int64(ts.max() + window_us + 1)
        # chunk users so (users_per_chunk-1)*span + ts.max + W < 2**62:
        # no int64 wrap at ANY user count (users never split chunks)
        per_chunk = max(1, int((np.int64(1) << 62) // span))
        n_pairs = 0
        n_users = 0
        for c0 in range(0, n_seg, per_chunk):
            c1 = min(c0 + per_chunk, n_seg)
            a, b = int(seg_start[c0]), int(seg_end[c1 - 1])
            shifted = ts[a:b] + (user_idx[a:b] - user_idx[a]) * span
            lo = np.searchsorted(shifted, shifted, side="right")
            hi = np.searchsorted(shifted, shifted + window_us,
                                 side="right")
            counts = hi - lo
            n_pairs += int(counts.sum())
            n_users += len(np.unique(uid[a:b][counts > 0]))
        return pd.DataFrame({
            "n_pairs": [n_pairs],
            "n_users": [n_users],
        })

    slim = events.select_columns(["user_id", "ts"])
    if events.count() <= driver_limit:  # metadata-only on parquet reads
        out = block_counts(slim.to_pandas())
    else:
        from ray.data.context import ShuffleStrategy

        prev = slim.context.shuffle_strategy
        slim.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            parts = (slim.repartition(num_partitions, keys=["user_id"])
                     .map_batches(block_counts, batch_format="pandas",
                                  batch_size=None)
                     .to_pandas())
        finally:
            slim.context.shuffle_strategy = prev
        out = pd.DataFrame({
            "n_pairs": [int(parts["n_pairs"].sum())],
            "n_users": [int(parts["n_users"].sum())],
        })
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.reset_index(drop=True)


def part_supplier_counts(lineitem: "ray.data.Dataset",
                         part: "ray.data.Dataset",
                         supplier: "ray.data.Dataset",
                         num_partitions: int = 8,
                         broadcast_limit: int = 5_000_000
                         ) -> pd.DataFrame:
    """TPC-H Q16 shape (adapted: shipments stand in for partsupp): per
    (p_brand, p_type, p_size), how many DISTINCT suppliers shipped the
    part — excluding denylisted suppliers (negative account balance,
    the complaints analog; reference shape Q16's NOT IN complaints
    subquery).

    Scale shape: the excluded-supplier set broadcasts (a deny-list is
    small by construction); part attrs broadcast as sorted arrays below
    ``broadcast_limit`` and swap to a hash shuffle join above it (the
    Q14/Q9 cut-over contract, dual-path identity tested).  Either way
    each lineitem batch combines to DISTINCT (brand, type, size,
    suppkey) rows — the only rows that shuffle — a distributed groupby
    collapses cross-batch duplicates, and the final per-group count is
    a combiner again (the grouped COUNT DISTINCT shape of
    weekly_active_users over a joined dimension)."""
    import ray
    from ray.data.aggregate import Count

    from gruut_ray.pipelines.agg_util import partial_then_merge

    bad = supplier.map_batches(
        lambda b: b.filter(pc.less(b.column("s_acctbal"),
                                   pa.scalar(0.0)))
        .select(["s_suppkey"]), batch_format="pyarrow").to_pandas()
    bad_keys = np.sort(bad["s_suppkey"].to_numpy(dtype=np.int64)) \
        if len(bad) else np.array([], dtype=np.int64)
    bad_ref = ray.put(bad_keys)

    attr_cols = ["p_partkey", "p_brand", "p_type", "p_size"]
    if part.count() <= broadcast_limit:
        pm = part.select_columns(attr_cols).to_pandas() \
            .sort_values("p_partkey")
        part_ref = ray.put((
            pm["p_partkey"].to_numpy(dtype=np.int64),
            pm["p_brand"].to_numpy(), pm["p_type"].to_numpy(),
            pm["p_size"].to_numpy(dtype=np.int64)))

        def quads(batch: pa.Table, _cache={}) -> pa.Table:
            m = _cache.get(part_ref)
            if m is None:
                _cache.clear()
                m = _cache[part_ref] = (ray.get(part_ref),
                                        ray.get(bad_ref))
            (pkeys, brand, ptype, size), bad_k = m
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(pkeys, pk),
                             max(len(pkeys) - 1, 0))
            ok = ((pkeys[pos] == pk) if len(pkeys)
                  else np.zeros(len(pk), bool)) & ~np.isin(sk, bad_k)
            df = pd.DataFrame({
                "p_brand": brand[pos][ok], "p_type": ptype[pos][ok],
                "p_size": size[pos][ok], "s_suppkey": sk[ok],
            }).drop_duplicates()
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        quad_ds = lineitem.select_columns(["l_partkey", "l_suppkey"]) \
            .map_batches(quads, batch_format="pyarrow")
    else:  # dimension outgrew worker heaps: hash shuffle join
        li = lineitem.select_columns(["l_partkey", "l_suppkey"]) \
            .repartition(num_partitions)
        pt = part.select_columns(attr_cols).repartition(num_partitions)
        full = li.join(pt, join_type="inner",
                       num_partitions=num_partitions,
                       on=("l_partkey",), right_on=("p_partkey",))

        def quads_joined(batch: pa.Table, _cache={}) -> pa.Table:
            bad_k = _cache.get(bad_ref)
            if bad_k is None:
                _cache.clear()
                bad_k = _cache[bad_ref] = ray.get(bad_ref)
            sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            ok = ~np.isin(sk, bad_k)
            df = pd.DataFrame({
                "p_brand": batch.column("p_brand")
                .to_numpy(zero_copy_only=False)[ok],
                "p_type": batch.column("p_type")
                .to_numpy(zero_copy_only=False)[ok],
                "p_size": pc.cast(batch.column("p_size"), pa.int64())
                .to_numpy(zero_copy_only=False)[ok],
                "s_suppkey": sk[ok],
            }).drop_duplicates()
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        # materialized: the join's aggregator pool must wind down before
        # the distinct groupby's spins up (chained hash shuffles in one
        # plan deadlock on CPU reservations — see _product_profit_shuffle)
        quad_ds = full.map_batches(quads_joined,
                                   batch_format="pyarrow").materialize()

    distinct = (quad_ds
                .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
                .aggregate(Count(alias_name="_n"))
                .repartition(num_partitions))

    def count_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({
                "p_brand": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int64()),
                "supplier_cnt": pa.array([], pa.int64())})
        df = pa.table({
            "p_brand": batch.column("p_brand"),
            "p_type": batch.column("p_type"),
            "p_size": pc.cast(batch.column("p_size"), pa.int64()),
        }).to_pandas()
        agg = df.groupby(["p_brand", "p_type", "p_size"],
                         as_index=False).size() \
            .rename(columns={"size": "supplier_cnt"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(distinct, count_partials,
                             ["p_brand", "p_type", "p_size"],
                             {"supplier_cnt": "sum"}, sort=False)
    if out.empty:
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "p_type": pd.Series(dtype="object"),
                             "p_size": pd.Series(dtype="int64"),
                             "supplier_cnt": pd.Series(dtype="int64")})
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return (out.sort_values(["supplier_cnt", "p_brand", "p_type",
                             "p_size"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


def important_parts(lineitem: "ray.data.Dataset",
                    fraction_ppm: int = 800,
                    num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q11 shape (adapted to shipped value): parts whose total
    discounted revenue exceeds ``fraction_ppm`` parts-per-million of
    the GLOBAL total — the fraction-of-global HAVING filter.

    Scale shape: one lineitem scan combines to (partkey, value_c4)
    partials, a distributed groupby collapses them to one row per
    part, the global total is an aggregate over that same (already
    reduced) table, and the threshold filter runs distributed — the
    driver only ever holds the passing rows.  The comparison is pure
    int64 (``value·10⁶ > total·ppm``), exact while ``total_c4·ppm``
    fits int64 (~10⁹ lineitem rows at ppm ≤ 1000; past that widen to
    Python-int partials, the partial_then_merge exact_int_cols
    contract)."""
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        value = pc.multiply(
            _cents(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(100),
                        _cents(batch.column("l_discount"))))
        df = pa.table({"l_partkey": batch.column("l_partkey"),
                       "value_c4": value}).to_pandas()
        agg = df.groupby("l_partkey", as_index=False)["value_c4"].sum()
        agg["value_c4"] = agg["value_c4"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    per_part = (lineitem.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("value_c4", alias_name="value_c4"))
        .materialize())
    total = int(per_part.sum("value_c4") or 0)
    thresh_ref = ray.put(total * int(fraction_ppm))

    def keep(batch: pa.Table, _cache={}) -> pa.Table:
        t = _cache.get(thresh_ref)
        if t is None:
            _cache.clear()
            t = _cache[thresh_ref] = ray.get(thresh_ref)
        v = pc.cast(batch.column("value_c4"), pa.int64())
        mask = pc.greater(
            pc.multiply(v, pa.scalar(1_000_000, type=pa.int64())),
            pa.scalar(t, type=pa.int64()))
        return pa.table({
            "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
            "value_c4": v}).filter(mask)

    out = per_part.map_batches(keep, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                             "value_c4": pd.Series(dtype="int64")})
    out["l_partkey"] = out["l_partkey"].astype("int64")
    out["value_c4"] = out["value_c4"].astype("int64")
    return (out.sort_values(["value_c4", "l_partkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def prominent_part_suppliers(lineitem: "ray.data.Dataset",
                             part: "ray.data.Dataset",
                             supplier: "ray.data.Dataset",
                             type_filter: str = "PROMO",
                             min_qty: int = 50) -> pd.DataFrame:
    """TPC-H Q20 shape (adapted): suppliers who shipped more than
    ``min_qty`` total units of ``type_filter`` parts — the semi-join
    through a grouped-sum threshold.

    Scale shape: the filtered part-key set broadcasts (sorted array),
    lineitem combines to (suppkey, qty) partials, the merged per-
    supplier sums filter by threshold, and only the passing suppkeys
    (small by construction) fetch their names via a broadcast-filtered
    supplier scan — supplier rows never shuffle."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    tk = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"),
                                    pa.scalar(type_filter)))
        .select(["p_partkey"]), batch_format="pyarrow").to_pandas()
    keys = np.sort(tk["p_partkey"].to_numpy(dtype=np.int64)) \
        if len(tk) else np.array([], dtype=np.int64)
    keys_ref = ray.put(keys)

    def qty_partials(batch: pa.Table, _cache={}) -> pa.Table:
        k = _cache.get(keys_ref)
        if k is None:
            _cache.clear()
            k = _cache[keys_ref] = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(k, pk), max(len(k) - 1, 0))
        hit = (k[pos] == pk) if len(k) else np.zeros(len(pk), bool)
        qty = _cents(batch.column("l_quantity")) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "s_suppkey": batch.column("l_suppkey")
            .to_numpy(zero_copy_only=False)[hit],
            "qty_c": qty[hit]})
        agg = df.groupby("s_suppkey", as_index=False)["qty_c"].sum()
        agg["qty_c"] = agg["qty_c"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    sums = partial_then_merge(
        lineitem.select_columns(["l_partkey", "l_suppkey",
                                 "l_quantity"]),
        qty_partials, ["s_suppkey"], {"qty_c": "sum"},
        exact_int_cols=["qty_c"])
    if sums.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "total_qty": pd.Series(dtype="int64")})
    sums["qty_c"] = [int(x) for x in sums["qty_c"]]
    passing = sums[sums["qty_c"] > min_qty * 100].copy()
    want = pa.array(sorted(int(x) for x in passing["s_suppkey"]),
                    type=pa.int64())
    names = supplier.map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_suppkey"),
                                    value_set=want))
        .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow").to_pandas()
    if names.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "total_qty": pd.Series(dtype="int64")})
    out = passing.merge(names, on="s_suppkey", how="inner")
    out["total_qty"] = (out["qty_c"] // 100).astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (out[["s_suppkey", "s_name", "total_qty"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def quantity_percentiles(lineitem: "ray.data.Dataset",
                         percents: typing.Sequence[int] = (50, 90)
                         ) -> pd.DataFrame:
    """Exact grouped discrete percentiles (percentile_disc) of
    l_quantity per return flag — the counting trick: quantities live
    in a tiny integer domain, so per-batch (flag, qty, n) histogram
    partials merge to a table bounded by |flags|×|domain| and the
    exact percentile is a cumulative-sum walk — no sort, no data
    shuffle (contrast value_quantiles_approx, the sketch path for
    unbounded domains).

    Matches SQL ``percentile_disc(p) WITHIN GROUP (ORDER BY q)``: the
    value at 1-based position ceil(p·n) of the sorted group (DuckDB
    semantics, calibrated)."""
    import math

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def hist_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "q": pc.cast(pc.round(batch.column("l_quantity")),
                         pa.int64()),
        }).to_pandas()
        agg = df.groupby(["l_returnflag", "q"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    hist = partial_then_merge(
        lineitem.select_columns(["l_returnflag", "l_quantity"]),
        hist_partials, ["l_returnflag", "q"], {"n": "sum"})
    if hist.empty:
        return pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                             **{f"p{p}": pd.Series(dtype="int64")
                                for p in percents}})
    cols = {f"p{p}": [] for p in percents}
    flags = []
    for flag, grp in hist.groupby("l_returnflag", sort=True):
        g = grp.sort_values("q")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        flags.append(flag)
        for p in percents:
            pos = max(1, math.ceil(p / 100.0 * total))
            idx = int(np.searchsorted(cum, pos, side="left"))
            cols[f"p{p}"].append(int(g["q"].iloc[idx]))
    out = pd.DataFrame({"l_returnflag": flags, **cols})
    for p in percents:
        out[f"p{p}"] = out[f"p{p}"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def full_coverage_customers(orders: "ray.data.Dataset",
                            year: int = 1995,
                            num_partitions: int = 8) -> pd.DataFrame:
    """Relational DIVISION: customers who placed orders in EVERY
    quarter of ``year`` (the "for all" shape — SQL's double NOT EXISTS
    or HAVING count(DISTINCT …) = |divisor|).

    Scale shape: per-batch distinct (custkey, quarter, n) partials, a
    distributed groupby collapses cross-batch duplicates to one row
    per pair, then a per-customer combiner sums quarter coverage and
    order counts — only distinct pairs ever shuffle, and the division
    predicate (nq == 4) applies to the already-reduced table."""
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def pair_partials(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_pandas()
        mask = (d.dt.year == year).to_numpy()
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False)[mask],
            "q": d.dt.quarter.to_numpy()[mask],
        })
        agg = df.groupby(["o_custkey", "q"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    pairs = (orders.select_columns(["o_custkey", "o_orderdate"])
             .map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["o_custkey", "q"])
             .aggregate(Sum("n", alias_name="n"))
             .repartition(num_partitions))

    def cust_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "nq": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        df = pa.table({
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "n": pc.cast(batch.column("n"), pa.int64()),
        }).to_pandas()
        agg = df.groupby("o_custkey", as_index=False).agg(
            nq=("n", "size"), n_orders=("n", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(pairs, cust_partials, ["o_custkey"],
                             {"nq": "sum", "n_orders": "sum"})
    if out.empty:
        return pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                             "n_orders": pd.Series(dtype="int64")})
    out = out[out["nq"] == 4].copy()
    out["o_custkey"] = out["o_custkey"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["o_custkey", "n_orders"]]
            .sort_values("o_custkey").reset_index(drop=True))


def lineitem_cube(lineitem: "ray.data.Dataset") -> pd.DataFrame:
    """CUBE grouping sets — SQL ``GROUP BY CUBE(l_returnflag,
    l_linestatus)`` — from ONE distributed aggregation: the finest
    grouping (flag, status) reduces via combiner partials, then the
    three coarser sets ((flag), (status), ()) are pure driver-side
    re-sums of that already-tiny table (≤ |flags|×|statuses| rows),
    never a second pass over data.  Exact integer sums throughout
    (count + fixed-point quantity cents), so every grouping-set row is
    the bit-exact re-aggregation of the same partials.  Grouped-out
    levels surface as ``'ALL'`` (the oracle COALESCEs NULL to the same
    marker) — the ROLLUP sibling is ``lang_source_rollup``."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": _cents(batch.column("l_quantity")),
        })
        agg = (t.group_by(["l_returnflag", "l_linestatus"])
               .aggregate([("qty_c", "sum"), ("qty_c", "count")])
               .rename_columns(["l_returnflag", "l_linestatus",
                                "sum_qty_c", "n_rows"]))
        return agg

    fine = partial_then_merge(
        lineitem.select_columns(["l_returnflag", "l_linestatus",
                                 "l_quantity"]),
        partials, ["l_returnflag", "l_linestatus"],
        {"sum_qty_c": "sum", "n_rows": "sum"},
        exact_int_cols=["sum_qty_c"])
    if fine.empty:
        return pd.DataFrame({
            "l_returnflag": pd.Series(dtype="object"),
            "l_linestatus": pd.Series(dtype="object"),
            "n_rows": pd.Series(dtype="int64"),
            "sum_qty_c": pd.Series(dtype="int64")})
    vals = ["sum_qty_c", "n_rows"]
    by_flag = fine.groupby("l_returnflag", as_index=False)[vals].sum()
    by_flag["l_linestatus"] = "ALL"
    by_status = fine.groupby("l_linestatus", as_index=False)[vals].sum()
    by_status["l_returnflag"] = "ALL"
    total = pd.DataFrame({"l_returnflag": ["ALL"],
                          "l_linestatus": ["ALL"],
                          "sum_qty_c": [fine["sum_qty_c"].sum()],
                          "n_rows": [fine["n_rows"].sum()]})
    out = pd.concat([fine, by_flag, by_status, total], ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_qty_c"] = [int(x) for x in out["sum_qty_c"]]
    out["sum_qty_c"] = out["sum_qty_c"].astype("int64")
    return (out[["l_returnflag", "l_linestatus", "n_rows", "sum_qty_c"]]
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))


def event_value_ntile(events: "ray.data.Dataset",
                      k: int = 4) -> pd.DataFrame:
    """Exact NTILE(k) windowed aggregate — SQL ``ntile(k) OVER
    (PARTITION BY event_type ORDER BY value, event_id)`` rolled up to
    (type, tile) counts and sums — WITHOUT ranking any row.

    The insight: the aggregate is invariant to how ties are broken
    (rows with equal (type, value) are interchangeable for count/sum),
    so the exact answer is a function of the per-(type, value)
    histogram alone.  Scale shape: per-batch (type, value_c, n)
    partials shuffle only distinct pairs (bounded by |types| × the
    fixed-point value domain); the driver walks each type's cumulative
    histogram with prefix sums, splitting a value run that straddles a
    tile boundary arithmetically (count × value).  DuckDB tile-size
    semantics: the first n % k tiles hold ceil(n/k) rows."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "v_c": _cents(batch.column("value")),
        })
        return (t.group_by(["event_type", "v_c"])
                .aggregate([("v_c", "count")])
                .rename_columns(["event_type", "v_c", "n"]))

    hist = partial_then_merge(
        events.select_columns(["event_type", "value"]),
        partials, ["event_type", "v_c"], {"n": "sum"})
    if hist.empty:
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "tile": pd.Series(dtype="int64"),
                             "n_rows": pd.Series(dtype="int64"),
                             "sum_value_c": pd.Series(dtype="int64")})
    rows = []
    for etype, grp in hist.groupby("event_type", sort=True):
        g = grp.sort_values("v_c")
        n_arr = g["n"].to_numpy(dtype=np.int64)
        v_arr = g["v_c"].to_numpy(dtype=np.int64)
        cum_n = np.cumsum(n_arr)
        cum_v = np.cumsum(n_arr * v_arr)
        total = int(cum_n[-1])

        def prefix_sum(p: int) -> int:
            # Sum of value_c over the first p rows in (value, id) order.
            if p <= 0:
                return 0
            i = int(np.searchsorted(cum_n, p, side="left"))
            before_n = int(cum_n[i - 1]) if i else 0
            before_v = int(cum_v[i - 1]) if i else 0
            return before_v + (p - before_n) * int(v_arr[i])

        base, rem = divmod(total, k)
        start = 0
        for tile in range(1, k + 1):
            size = base + (1 if tile <= rem else 0)
            if size == 0:
                continue
            end = start + size
            rows.append((etype, tile, size,
                         prefix_sum(end) - prefix_sum(start)))
            start = end
    out = pd.DataFrame(rows, columns=["event_type", "tile",
                                      "n_rows", "sum_value_c"])
    for c in ("tile", "n_rows", "sum_value_c"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["event_type", "tile"])
            .reset_index(drop=True))


# The packed-argmin shift: price_c * 2**32 + suppkey fits int64 while
# price_c < 2**30 (~$10.7M in cents) and suppkey < 2**32 — both hold
# with wide margin for TPC-H-shaped data (l_extendedprice ≤ ~$105k).
_ARGMIN_SHIFT = 1 << 32


def min_cost_supplier(lineitem: "ray.data.Dataset",
                      part: "ray.data.Dataset",
                      supplier: "ray.data.Dataset",
                      size: int = 15) -> pd.DataFrame:
    """TPC-H Q2 shape (adapted to lineitem as the supply table): for
    each part of the chosen size, the minimum sale price and the
    lowest-numbered supplier achieving it (Q2's correlated
    ``= (SELECT min(...))`` subquery with a deterministic tie-break).

    Scale shape: the filtered part-key set broadcasts; the correlated
    argmin is ONE grouped MIN over a packed int64
    (price_c * 2**32 + suppkey) — min of the packed key IS
    (min price, then min suppkey), so the combiner stays a plain
    column-wise min and no second pass or self-join re-finds the
    witnesses.  Winner names come from a broadcast-filtered supplier
    scan; supplier rows never shuffle."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    tk = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_size"),
                                    pa.scalar(size, pa.int32())))
        .select(["p_partkey"]), batch_format="pyarrow").to_pandas()
    keys = np.sort(tk["p_partkey"].to_numpy(dtype=np.int64)) \
        if len(tk) else np.array([], dtype=np.int64)
    keys_ref = ray.put(keys)

    def argmin_partials(batch: pa.Table, _cache={}) -> pa.Table:
        kk = _cache.get(keys_ref)
        if kk is None:
            _cache.clear()
            kk = _cache[keys_ref] = ray.get(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(kk, pk), max(len(kk) - 1, 0))
        hit = (kk[pos] == pk) if len(kk) else np.zeros(len(pk), bool)
        price = _cents(batch.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)[hit]
        supp = batch.column("l_suppkey") \
            .to_numpy(zero_copy_only=False)[hit]
        if len(price) and int(price.max()) >= _ARGMIN_SHIFT:
            raise ValueError("price_c exceeds packed-argmin headroom")
        df = pd.DataFrame({
            "p_partkey": pk[hit],
            "packed": price * _ARGMIN_SHIFT + supp})
        agg = df.groupby("p_partkey", as_index=False)["packed"].min()
        agg["packed"] = agg["packed"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    packed = partial_then_merge(
        lineitem.select_columns(["l_partkey", "l_suppkey",
                                 "l_extendedprice"]),
        argmin_partials, ["p_partkey"], {"packed": "min"})
    empty = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                          "min_price_c": pd.Series(dtype="int64"),
                          "s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype="object")})
    if packed.empty:
        return empty
    packed["min_price_c"] = (packed["packed"] //
                             _ARGMIN_SHIFT).astype("int64")
    packed["s_suppkey"] = (packed["packed"] %
                           _ARGMIN_SHIFT).astype("int64")
    want = pa.array(sorted(set(int(x) for x in packed["s_suppkey"])),
                    type=pa.int64())
    names = supplier.map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_suppkey"),
                                    value_set=want))
        .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow").to_pandas()
    if names.empty:
        return empty
    out = packed.merge(names, on="s_suppkey", how="inner")
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return (out[["p_partkey", "min_price_c", "s_suppkey", "s_name"]]
            .sort_values("p_partkey").reset_index(drop=True))


def full_outer_user_activity(orders: "ray.data.Dataset",
                             events: "ray.data.Dataset",
                             year: int = 1995,
                             etype: str = "purchase") -> pd.DataFrame:
    """FULL OUTER JOIN of two aggregates — 1995 order activity vs
    purchase-event activity per user — rolled up by coverage class
    ('both' / 'orders_only' / 'events_only').

    Scale shape: a full outer join of AGGREGATES needs no join
    operator at all — each side maps to per-key partials carrying
    zeros for the other side's measures, the two Datasets UNION, and
    ONE distributed groupby(key) sums all measures (a key missing on
    a side simply contributes its zeros — exactly the COALESCE
    semantics of the outer join).  The per-key table never lands on
    the driver: a second combiner classifies each key row into its
    coverage class and reduces to ≤3 rows.  Only distinct keys
    shuffle once; both fact tables stream."""
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import partial_then_merge

    MEASURES = ["n_orders", "orders_c", "n_events", "events_c"]

    def order_partials(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_pandas()
        mask = (d.dt.year == year).to_numpy()
        price = _cents(batch.column("o_totalprice")) \
            .to_numpy(zero_copy_only=False)[mask]
        df = pd.DataFrame({
            "k": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False)[mask],
            "orders_c": price})
        agg = df.groupby("k", as_index=False).agg(
            n_orders=("orders_c", "size"), orders_c=("orders_c", "sum"))
        agg["n_events"] = np.int64(0)
        agg["events_c"] = np.int64(0)
        for c in MEASURES:
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(
            agg[["k"] + MEASURES],
            preserve_index=False).replace_schema_metadata(None)

    def event_partials(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("event_type"),
                        pa.scalar(etype)).to_numpy(zero_copy_only=False)
        val = _cents(batch.column("value")) \
            .to_numpy(zero_copy_only=False)[mask]
        df = pd.DataFrame({
            "k": batch.column("user_id")
            .to_numpy(zero_copy_only=False)[mask],
            "events_c": val})
        agg = df.groupby("k", as_index=False).agg(
            n_events=("events_c", "size"), events_c=("events_c", "sum"))
        agg["n_orders"] = np.int64(0)
        agg["orders_c"] = np.int64(0)
        for c in MEASURES:
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(
            agg[["k"] + MEASURES],
            preserve_index=False).replace_schema_metadata(None)

    left = (orders.select_columns(["o_custkey", "o_orderdate",
                                   "o_totalprice"])
            .map_batches(order_partials, batch_format="pyarrow"))
    right = (events.select_columns(["user_id", "event_type", "value"])
             .map_batches(event_partials, batch_format="pyarrow"))
    per_key = left.union(right).groupby("k").aggregate(
        *[Sum(c, alias_name=c) for c in MEASURES])

    def classify(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"side": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64())
                                for c in MEASURES}})
        df = batch.to_pandas()
        has_o = df["n_orders"].to_numpy() > 0
        has_e = df["n_events"].to_numpy() > 0
        df["side"] = np.where(has_o & has_e, "both",
                              np.where(has_o, "orders_only",
                                       "events_only"))
        agg = df.groupby("side", as_index=False).agg(
            n_users=("k", "size"),
            **{c: (c, "sum") for c in MEASURES})
        for c in ["n_users"] + MEASURES:
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(
        per_key, classify, ["side"],
        {c: "sum" for c in ["n_users"] + MEASURES},
        exact_int_cols=["orders_c", "events_c"])
    if out.empty:
        return pd.DataFrame({"side": pd.Series(dtype="object"),
                             "n_users": pd.Series(dtype="int64"),
                             **{c: pd.Series(dtype="int64")
                                for c in MEASURES}})
    for c in ["n_users"] + MEASURES:
        out[c] = [int(x) for x in out[c]]
        out[c] = out[c].astype("int64")
    return (out[["side", "n_users"] + MEASURES]
            .sort_values("side").reset_index(drop=True))


def mode_quantity_by_flag(lineitem: "ray.data.Dataset") -> pd.DataFrame:
    """Grouped MODE (most frequent value, ties broken toward the
    smallest) of l_quantity per return flag — the argmax-of-counts
    statistical aggregate, computed from the same bounded-domain
    counting histogram as ``quantity_percentiles``: per-batch
    (flag, qty, n) partials merge distributively, and the mode is a
    driver-side argmax over the |flags|×|domain| table.  No sort, no
    data shuffle."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def hist_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "q": pc.cast(pc.round(batch.column("l_quantity")),
                         pa.int64()),
        }).to_pandas()
        agg = df.groupby(["l_returnflag", "q"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    hist = partial_then_merge(
        lineitem.select_columns(["l_returnflag", "l_quantity"]),
        hist_partials, ["l_returnflag", "q"], {"n": "sum"})
    if hist.empty:
        return pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                             "mode_qty": pd.Series(dtype="int64"),
                             "n_rows": pd.Series(dtype="int64")})
    hist = hist.sort_values(["l_returnflag", "n", "q"],
                            ascending=[True, False, True],
                            kind="mergesort")
    out = hist.groupby("l_returnflag", as_index=False).first() \
        .rename(columns={"q": "mode_qty", "n": "n_rows"})
    out["mode_qty"] = out["mode_qty"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return (out[["l_returnflag", "mode_qty", "n_rows"]]
            .sort_values("l_returnflag").reset_index(drop=True))


def order_stats_by_flag(lineitem: "ray.data.Dataset") -> pd.DataFrame:
    """Grouped second-moment statistical aggregates per return flag:
    sample stddev of quantity, Pearson correlation of quantity vs
    extended price, and the regression slope price-per-quantity —
    the stddev_samp / corr / regr_slope SQL aggregate family
    (reference analog: gruut has no relational layer; this rounds out
    the engine's aggregate surface next to SUM/MIN/MAX/MODE/percentile).

    Exactness: quantity is integral and price carries exactly two
    decimals, so the five raw moments (Σx, Σx², Σy, Σy², Σxy in
    qty/cent units) are EXACT integers — int64 per batch, merged with
    arbitrary-precision Python ints by ``partial_then_merge``'s
    exact_int_cols path (Σy² reaches ~1e14 per row, past int64 at
    corpus scale).  The closed-form results are then each a handful of
    correctly-rounded float ops on exact integers, deterministic and
    partition-invariant — no order-of-summation noise vs the DuckDB
    oracle.  Scale shape: pure combiner, only |flags|×blocks moment
    rows ever move; no shuffle, no sort."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def moment_partials(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_pandas()
        x = pc.cast(pc.round(batch.column("l_quantity")),
                    pa.int64()).to_numpy()
        y = _cents(batch.column("l_extendedprice")).to_numpy()
        # y² reaches ~1e14 per row: a multi-million-row block would wrap
        # int64 summing it directly, so split into 32-bit halves — each
        # half's per-block sum stays ≤ 2^32·rows ≪ 2^63, and the exact
        # value is rebuilt as hi·2^32 + lo after the Python-int merge.
        y2 = y * y
        df = pd.DataFrame({
            "l_returnflag": flag,
            "n": np.int64(1), "sx": x, "sxx": x * x,
            "sy": y, "syy_hi": y2 >> 32, "syy_lo": y2 & 0xFFFFFFFF,
            "sxy": x * y,
        })
        agg = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    cols = ["n", "sx", "sxx", "sy", "syy_hi", "syy_lo", "sxy"]
    m = partial_then_merge(
        lineitem.select_columns(["l_returnflag", "l_quantity",
                                 "l_extendedprice"]),
        moment_partials, ["l_returnflag"],
        {c: "sum" for c in cols}, exact_int_cols=cols)
    if m.empty:
        return pd.DataFrame({
            "l_returnflag": pd.Series(dtype="object"),
            "n_rows": pd.Series(dtype="int64"),
            "qty_stddev": pd.Series(dtype="float64"),
            "qty_price_corr": pd.Series(dtype="float64"),
            "price_per_qty": pd.Series(dtype="float64")})
    rows = []
    for r in m.itertuples(index=False):
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        sy, sxy = int(r.sy), int(r.sxy)
        syy = (int(r.syy_hi) << 32) + int(r.syy_lo)
        # exact integer central second moments: n·Σx² − (Σx)² etc.
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        cov = n * sxy - sx * sy
        stddev = (vx / (n * (n - 1))) ** 0.5 if n > 1 else None
        corr = cov / (vx * vy) ** 0.5 if n > 1 and vx and vy else None
        # slope in cents/qty → dollars/qty (y was exact cents)
        slope = cov / vx / 100.0 if n > 1 and vx else None
        rows.append((r.l_returnflag, n, stddev, corr, slope))
    out = pd.DataFrame(rows, columns=[
        "l_returnflag", "n_rows", "qty_stddev", "qty_price_corr",
        "price_per_qty"])
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def quantile_cont_by_flag(lineitem: "ray.data.Dataset") -> pd.DataFrame:
    """Grouped INTERPOLATED quantiles (SQL ``quantile_cont`` /
    ``percentile_cont(p) WITHIN GROUP``) of l_quantity per return flag
    — p25 / median / p75 with the standard linear interpolation at
    rank h = (n-1)·p, computed EXACTLY from the same bounded-domain
    counting histogram as ``mode_quantity_by_flag``: per-batch
    (flag, qty, n) partials merge distributively, and the driver walks
    the |flags|×|domain| cumulative table (a few hundred rows) to read
    off the two bracketing order statistics per target.  This differs
    from ``quantity_percentiles`` (nearest-rank discrete percentiles)
    in returning the continuous-interpolation definition DuckDB's
    ``quantile_cont`` uses, including fractional midpoints for even
    group sizes.  No sort, no data shuffle; exact because counts are
    integers and the interpolation is one float op on two exact values."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def hist_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "q": pc.cast(pc.round(batch.column("l_quantity")),
                         pa.int64()),
        }).to_pandas()
        agg = df.groupby(["l_returnflag", "q"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    hist = partial_then_merge(
        lineitem.select_columns(["l_returnflag", "l_quantity"]),
        hist_partials, ["l_returnflag", "q"], {"n": "sum"})
    cols = ["l_returnflag", "n_rows", "qty_p25", "qty_median", "qty_p75"]
    if hist.empty:
        return pd.DataFrame({
            "l_returnflag": pd.Series(dtype="object"),
            "n_rows": pd.Series(dtype="int64"),
            "qty_p25": pd.Series(dtype="float64"),
            "qty_median": pd.Series(dtype="float64"),
            "qty_p75": pd.Series(dtype="float64")})

    def interp(vals: np.ndarray, cum: np.ndarray, h: float) -> float:
        # value of the 0-indexed order statistic floor(h)/ceil(h),
        # linearly interpolated: cum[k] is the count of rows ≤ vals[k],
        # so order statistic i lives at the first k with cum[k] > i.
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        v_lo = vals[np.searchsorted(cum, lo, side="right")]
        v_hi = vals[np.searchsorted(cum, hi, side="right")]
        return float(v_lo) + (h - lo) * (float(v_hi) - float(v_lo))

    rows = []
    for flag, grp in hist.sort_values(["l_returnflag", "q"]) \
                         .groupby("l_returnflag", sort=True):
        vals = grp["q"].to_numpy(dtype=np.int64)
        cum = np.cumsum(grp["n"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        rows.append((flag, n,
                     interp(vals, cum, (n - 1) * 0.25),
                     interp(vals, cum, (n - 1) * 0.50),
                     interp(vals, cum, (n - 1) * 0.75)))
    out = pd.DataFrame(rows, columns=cols)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def exact_median_price_by_flag(lineitem: "ray.data.Dataset",
                               bins: int = 4096,
                               max_rounds: int = 8) -> pd.DataFrame:
    """Grouped EXACT interpolated median of l_extendedprice — an
    UNBOUNDED value domain (~1e9 distinct cent values), where the
    counting-histogram trick behind ``quantile_cont_by_flag`` cannot
    enumerate the domain.  Classic distributed selection by iterative
    histogram refinement: round 0 scans once for per-flag
    (count, min, max); each later round scans once counting per-(flag,
    bin) rows over each group's CURRENT candidate range split into
    ``bins`` equal integer-cent buckets (plus one below-range bucket,
    so ranks are recomputed from the scan itself — no drift-prone
    driver bookkeeping), then the driver walks the tiny |flags|×bins
    table to find the buckets holding the two bracketing order
    statistics (ranks ⌊(n−1)/2⌋ and ⌈(n−1)/2⌉) and shrinks the range
    to their union.  Ranges shrink ×(bins/2) per round, so a 1e9-cent
    domain pins to ≤ ``bins`` distinct values in ≤ 3 data passes; a
    final in-range counting histogram reads the exact values off and
    interpolates.  Scale shape: every pass is a combiner over the same
    pruned 2-column read — only |flags|×bins partial rows move, no
    sort, no shuffle; driver state is O(|flags|).  All arithmetic on
    exact integer cents → partition-invariant, hash-stable vs the SQL
    ``quantile_cont(…, 0.5)`` oracle.  Rows above a group's candidate
    range may spill into its top buckets (the range end is not a bucket
    boundary); that inflates cumulative counts only at/after the
    target bucket, which cannot move the crossing point, so the
    narrowing stays correct."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    slim = lineitem.select_columns(["l_returnflag", "l_extendedprice"])

    def _flag_cents(batch: pa.Table):
        return (batch.column("l_returnflag").to_pandas().to_numpy(),
                _cents(batch.column("l_extendedprice")).to_numpy())

    def minmax_partials(batch: pa.Table) -> pa.Table:
        flag, c = _flag_cents(batch)
        df = pd.DataFrame({"flag": flag, "c": c})
        agg = df.groupby("flag", as_index=False).agg(
            n=("c", "size"), lo=("c", "min"), hi=("c", "max"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    mm = partial_then_merge(slim, minmax_partials, ["flag"],
                            {"n": "sum", "lo": "min", "hi": "max"})
    if mm.empty:
        return pd.DataFrame({
            "l_returnflag": pd.Series(dtype="object"),
            "n_rows": pd.Series(dtype="int64"),
            "price_median": pd.Series(dtype="float64")})

    # per-flag state: candidate integer-cent range [lo, hi] containing
    # both target order statistics (0-indexed global ranks k_lo ≤ k_hi).
    state = {}
    for r in mm.itertuples(index=False):
        n = int(r.n)
        state[r.flag] = {"lo": int(r.lo), "hi": int(r.hi), "n": n,
                         "k_lo": (n - 1) // 2, "k_hi": n // 2}

    def _counts_table(frames) -> pa.Table:
        if frames:
            allp = pd.concat(frames, ignore_index=True)
        else:
            allp = pd.DataFrame({"flag": [], "b": [], "cnt": []})
        return pa.table({
            "flag": pa.array(allp["flag"], pa.string()),
            "b": pa.array(allp["b"], pa.int64()),
            "cnt": pa.array(allp["cnt"], pa.int64()),
        })

    for _ in range(max_rounds):
        ranges = {f: (st["lo"],
                      (st["hi"] - st["lo"] + 1 + bins - 1) // bins)
                  for f, st in state.items()
                  if "split" not in st and st["hi"] - st["lo"] + 1 > bins}
        if not ranges:
            break

        def bin_partials(batch: pa.Table, _ranges=ranges) -> pa.Table:
            flag, c = _flag_cents(batch)
            out = []
            for f, (lo, w) in _ranges.items():
                cf = c[flag == f]
                # bucket -1 = below range (exact rank offset, recounted
                # every round); above-range rows clamp into the top
                # buckets (see docstring: provably harmless).
                b = np.where(cf < lo, np.int64(-1),
                             np.minimum((cf - lo) // w, bins - 1))
                u, cnt = np.unique(b, return_counts=True)
                out.append(pd.DataFrame({"flag": f, "b": u, "cnt": cnt}))
            return _counts_table(out)

        h = partial_then_merge(slim, bin_partials, ["flag", "b"],
                               {"cnt": "sum"})
        for f, (lo, w) in ranges.items():
            st = state[f]
            g = h[(h["flag"] == f) & (h["b"] >= 0)].sort_values("b")
            bidx = g["b"].to_numpy(dtype=np.int64)
            below = int(h[(h["flag"] == f) & (h["b"] < 0)]["cnt"].sum())
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64)) + below
            i_lo = int(np.searchsorted(cum, st["k_lo"], side="right"))
            i_hi = int(np.searchsorted(cum, st["k_hi"], side="right"))
            b_lo, b_hi = int(bidx[i_lo]), int(bidx[i_hi])
            if b_lo != b_hi:
                # The two bracketing ranks landed in DIFFERENT buckets:
                # cum(b_lo) = k_lo+1 and cum(b_hi−1) = k_hi exactly, so
                # rank k_lo is the LARGEST in-range value of bucket b_lo
                # and rank k_hi the SMALLEST of bucket b_hi — a union
                # range would stop shrinking, but one conditional
                # min/max scan resolves both exactly.  Bucket ends clamp
                # to the group's hi so above-range clamped rows can't
                # pollute the max.
                st["split"] = (lo + b_lo * w,
                               min(st["hi"], lo + (b_lo + 1) * w - 1),
                               lo + b_hi * w,
                               min(st["hi"], lo + (b_hi + 1) * w - 1))
            else:
                st["lo"], st["hi"] = (lo + b_lo * w,
                                      min(st["hi"],
                                          lo + (b_hi + 1) * w - 1))
    assert all("split" in st or st["hi"] - st["lo"] + 1 <= bins
               for st in state.values()), \
        "median refinement did not converge within max_rounds"

    split = {f: st["split"] for f, st in state.items() if "split" in st}
    if split:
        BIG = np.int64(2 ** 62)

        def split_partials(batch: pa.Table, _sp=split) -> pa.Table:
            flag, c = _flag_cents(batch)
            rows = {"flag": [], "vmax": [], "vmin": []}
            for f, (a1, b1, a2, b2) in _sp.items():
                cf = c[flag == f]
                in1 = cf[(cf >= a1) & (cf <= b1)]
                in2 = cf[(cf >= a2) & (cf <= b2)]
                rows["flag"].append(f)
                rows["vmax"].append(in1.max() if in1.size else -BIG)
                rows["vmin"].append(in2.min() if in2.size else BIG)
            return pa.table({
                "flag": pa.array(rows["flag"], pa.string()),
                "vmax": pa.array(rows["vmax"], pa.int64()),
                "vmin": pa.array(rows["vmin"], pa.int64()),
            })

        sp = partial_then_merge(slim, split_partials, ["flag"],
                                {"vmax": "max", "vmin": "min"})
        split_vals = {r.flag: (int(r.vmax), int(r.vmin))
                      for r in sp.itertuples(index=False)}

    fr = {f: (st["lo"], st["hi"]) for f, st in state.items()
          if "split" not in st}

    def final_partials(batch: pa.Table, _fr=fr) -> pa.Table:
        flag, c = _flag_cents(batch)
        out = []
        for f, (lo, hi) in _fr.items():
            cf = c[flag == f]
            below = np.int64((cf < lo).sum())
            u, cnt = np.unique(cf[(cf >= lo) & (cf <= hi)],
                               return_counts=True)
            out.append(pd.DataFrame({
                "flag": f,
                "b": np.concatenate(([np.int64(-1)], u)),
                "cnt": np.concatenate(([below], cnt))}))
        return _counts_table(out)

    fh = (partial_then_merge(slim, final_partials, ["flag", "b"],
                             {"cnt": "sum"})
          if fr else pd.DataFrame({"flag": [], "b": [], "cnt": []}))
    rows = []
    for f, st in state.items():
        if "split" in st:
            v_lo, v_hi = split_vals[f]
        else:
            g = fh[(fh["flag"] == f) & (fh["b"] >= 0)].sort_values("b")
            below = int(fh[(fh["flag"] == f) & (fh["b"] < 0)]["cnt"].sum())
            vals = g["b"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64)) + below
            v_lo = int(vals[np.searchsorted(cum, st["k_lo"],
                                            side="right")])
            v_hi = int(vals[np.searchsorted(cum, st["k_hi"],
                                            side="right")])
        rows.append((f, st["n"], (v_lo + v_hi) / 2.0 / 100.0))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows",
                                      "price_median"])
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)
