"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + dtype schema + sorted value equality).

    python tools/verify_queries.py [sf_dir] [query_name ...]
"""

import logging
import sys
import time

import duckdb
import pandas as pd
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_df(x):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(x, (rd.Dataset,)):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(
        address="local", num_cpus=int(__import__("os").environ.get("VQ_CPUS", 8)), include_dashboard=False, logging_level="ERROR"
    )
    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf}/{name}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_df(fn(sf))
        except Exception as e:
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}", flush=True)
            failures += 1
            continue
        t1 = time.time()
        if name not in osql:
            print(f"rows-only {name}: rows={len(mine)} ray={t1 - t0:.1f}s", flush=True)
            continue
        oracle = con.execute(osql[name]).fetchdf()
        t2 = time.time()
        cols = sorted(mine.columns)
        ok = True
        msg = ""
        if sorted(oracle.columns) != cols:
            ok, msg = False, f"columns {cols} vs {sorted(oracle.columns)}"
        else:
            # NO canonicalization of list cells: the driver's compare can't
            # hash list columns either, so an oracle-bearing query with a
            # list column must serialize it (quantity_vector's string_agg
            # contract) — this tool failing loudly on one is the point.
            m = mine[cols].sort_values(cols).reset_index(drop=True)
            o = oracle[cols].sort_values(cols).reset_index(drop=True)
            if len(m) != len(o):
                ok, msg = False, f"rows {len(m)} vs {len(o)}"
            else:
                try:
                    pd.testing.assert_frame_equal(m, o, check_dtype=False)
                except AssertionError as e:
                    ok, msg = False, " | ".join(str(e).splitlines()[:3])
                if list(m.dtypes.astype(str)) != list(o.dtypes.astype(str)):
                    msg += f" [dtypes {list(m.dtypes.astype(str))} vs {list(o.dtypes.astype(str))}]"
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(
            f"{status} {name}: rows={len(mine)} ray={t1 - t0:.1f}s sql={t2 - t1:.1f}s {msg}",
            flush=True,
        )
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
