#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB
against the same parquet tables, then compares row count, column names, and
values (columns sorted by name, rows sorted, cell-canonicalized). Floats are
compared EXACTLY (the driver hashes values) — a near-miss is reported as
NEAR and counts as failure, meaning a determinism convention was violated.

Usage:
  python scripts/check_oracle.py                      # all queries at sf0.001
  python scripts/check_oracle.py --sf /root/testdata/sf0.01 q_agg_basic ...
"""

from __future__ import annotations

import argparse
import datetime
import math
import os
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell for engine-neutral comparison."""
    if v is None:
        return ("\x00null",)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x01nan",)
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("dt", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(canon(x) for x in v))
    if isinstance(v, dict):  # struct rows from duckdb
        return ("m", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if hasattr(v, "asDict"):  # pyspark Row
        return ("m", tuple(sorted((k, canon(x)) for k, x in v.asDict().items())))
    return ("s", str(v))


def near(a, b) -> bool:
    """True when two canonical cells differ only by float noise."""
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        if a[0] == "f" and b[0] == "f":
            x, y = float(a[1]), float(b[1])
            return math.isclose(x, y, rel_tol=1e-7, abs_tol=1e-9)
        if a[0] == b[0] == "l" or a[0] == b[0] == "m":
            return len(a[1]) == len(b[1]) and all(near(x, y) for x, y in zip(a[1], b[1]))
    return False


def rows_of_spark(df):
    cols = sorted(df.columns)
    return cols, [tuple(canon(r[c]) for c in cols) for r in df.collect()]


def rows_of_duck(con, sql):
    res = con.sql(sql)
    cols_raw = res.columns
    # Driver blind spot closed (VERDICT r5 #1): the driver canonicalizes via
    # pandas, where DuckDB HUGEINT becomes float64 ("241.0" vs Spark's bigint
    # "241") and the value hash flips even though fetchall() Python ints
    # compare equal here. Any uncast integer SUM() in an oracle is therefore
    # a contract violation — fail it HERE, before the driver ever sees it.
    bad = [f"{c}:{t}" for c, t in zip(cols_raw, res.types)
           if str(t).upper() in ("HUGEINT", "UHUGEINT")]
    if bad:
        raise TypeError(
            f"oracle result has HUGEINT column(s) {bad} — wrap the integer "
            f"SUM() in CAST(... AS BIGINT) (DEVNOTES gotcha: DuckDB "
            f"SUM(INTEGER/BIGINT) widens to HUGEINT, which the driver's "
            f"pandas canonicalizer renders as float64 and the hash flips)")
    order = sorted(range(len(cols_raw)), key=lambda i: cols_raw[i])
    cols = [cols_raw[i] for i in order]
    return cols, [tuple(canon(row[i]) for i in order) for row in res.fetchall()]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--vanilla", action="store_true",
                    help="plain SparkSession without engine defaults "
                         "(simulates the driver's own session)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.appName("check-oracle-vanilla")
                 .master(f"local[{args.cpus}]").getOrCreate())
    else:
        from platform_etl_backend_spark.engine.session import get_spark

        spark = get_spark("check-oracle", master=f"local[{args.cpus}]",
                          extra_conf={"spark.sql.shuffle.partitions": args.cpus})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_ok = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols, s_rows = rows_of_spark(sdf)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            d_cols, d_rows = rows_of_duck(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        status = None
        if s_cols != d_cols:
            status = f"columns differ: spark={s_cols} duck={d_cols}"
        elif len(s_rows) != len(d_rows):
            status = f"row count: spark={len(s_rows)} duck={len(d_rows)}"
        else:
            s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
            if s_sorted != d_sorted:
                n_bad = sum(1 for a, b in zip(s_sorted, d_sorted) if a != b)
                example = next(((a, b) for a, b in zip(s_sorted, d_sorted) if a != b), None)
                tag = "NEAR" if all(
                    near(a, b) for a, b in zip(s_sorted, d_sorted)
                ) else "VALUES"
                status = f"{tag} mismatch in {n_bad}/{len(s_rows)} rows; e.g.\n  spark={example[0]}\n  duck ={example[1]}"
        if status:
            print(f"FAIL  {name}: {status}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_ok += 1

    print(f"\n{n_ok} ok, {n_rows_only} rows-only, {n_fail} FAILED "
          f"(of {len(names)}) at {args.sf}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
