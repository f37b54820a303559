#!/usr/bin/env python
"""Time named queries with the noop sink in one fresh JVM (min-of-N).

Usage:
  python scripts/time_queries.py q_entity_resolution q_nb_crossval
  SPARK_GRAFT_CPUS=32 python scripts/time_queries.py --passes 3 --sf /root/testdata/sf0.1 q_x

Mirrors bench.py methodology (noop write, clearCache between passes,
min-of-N) for quick isolated measurement without the 223-query sweep.
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
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from platform_etl_backend_spark.engine.session import get_spark
    from platform_etl_backend_spark.catalog import QUERIES

    spark = get_spark(
        "time-queries",
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
            QUERIES[name].fn(spark, args.warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        spark.catalog.clearCache()

    out = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(args.passes):
            t0 = time.time()
            QUERIES[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
