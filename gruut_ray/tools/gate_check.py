"""Replicate the driver's correctness gate locally.

Runs every ``queries()`` entry at a chosen scale factor and compares the
oracled ones against DuckDB exactly the way the driver does (columns
sorted by name, order-insensitive, float tolerance 1e-4):

    python -m gruut_ray.tools.gate_check [--sf-dir /root/testdata/sf0.01]

Prints one line per query and a FAILS summary; exit code 1 on any
failure.  Owns its Ray session (standalone script)."""

from __future__ import annotations

import argparse
import sys
import time


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(4)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--only", default="",
                    help="comma-separated query-name filter")
    args = ap.parse_args(argv)

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    tables = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")
    queries, oracles = entry.queries(), entry.oracle_sql()
    names = sorted(queries)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]
    fails = []
    for name in names:
        t0 = time.time()
        try:
            out = queries[name](args.sf_dir)
            got = out if isinstance(out, pd.DataFrame) else out.to_pandas()
            if name in oracles:
                a = canon(got)
                b = canon(con.execute(oracles[name]).fetchdf())
                ok = (list(a.columns) == list(b.columns)
                      and len(a) == len(b))
                if ok:
                    try:
                        pd.testing.assert_frame_equal(
                            a, b, check_dtype=False, check_exact=False,
                            rtol=1e-4, atol=1e-4)
                    except AssertionError:
                        ok = False
                status = "OK  " if ok else "FAIL"
            else:
                ok = len(got) >= 0
                status = "ok* " if ok else "FAIL"  # rows-only
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — report-and-continue tool
            status = f"ERR({type(ex).__name__})"
            fails.append(name)
        print(f"{status} {name} {time.time() - t0:6.1f}s", flush=True)
    print(f"{len(names) - len(fails)}/{len(names)} clean; FAILS: {fails}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
