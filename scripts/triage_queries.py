#!/usr/bin/env python
"""Triage named queries: construction (driver plan-build) vs execution
(noop sink) split, at two SFs, min-of-N in one JVM.

Usage:
  python scripts/triage_queries.py q_a q_b [--passes 3]

For each query prints: construct seconds (DataFrame build, before any
action), execute seconds at sf0.001 and sf0.1 (noop sink, min-of-N).
A query whose sf0.1 execute ~= sf0.001 execute is fixed-overhead-bound
(orchestration/stages), not data-bound — optimize by removing stages and
job boundaries, not per-row work (guide §1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--small", default="/root/testdata/sf0.001")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from platform_etl_backend_spark.engine.session import get_spark
    from platform_etl_backend_spark.catalog import QUERIES

    spark = get_spark(
        "triage-queries",
        master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(args.cpus), 8)),
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args.queries:  # warm codegen/JIT on the tiny SF
        try:
            QUERIES[name].fn(spark, args.small).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        spark.catalog.clearCache()

    out = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(name)
        row = {}
        # construct split: build the DataFrame (drives any eager driver work
        # like localCheckpoints during plan build), no terminal action timed
        best_c = None
        for _ in range(args.passes):
            t0 = time.time()
            df = QUERIES[name].fn(spark, args.big)
            dt = time.time() - t0
            spark.catalog.clearCache()
            best_c = dt if best_c is None else min(best_c, dt)
        row["construct"] = round(best_c, 3)
        for label, sf in (("small", args.small), ("big", args.big)):
            best = None
            for _ in range(args.passes):
                t0 = time.time()
                QUERIES[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                spark.catalog.clearCache()
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 3)
        out[name] = row
        print(f"{name}: construct={row['construct']} sf0.001={row['small']} "
              f"sf0.1={row['big']}", flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
