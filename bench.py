#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}. Each query is forced end-to-end with a
noop-format write (full computation, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_agg_basic",
    "q_scalar_filter_sum",
    "q_join_multi",
    "q_join_lut_broadcast",
    "q_left_join_fill",
    "q_rank_topk",
    "q_latest_order_per_customer",
    "q_sessionize",
    "q_time_buckets",
    "q_llr_contingency",
    "q_minhash_lsh",
    "q_simhash",
    "q_cosine_topk",
    "q_ann_bucketed",
    "q_doc_tokens",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from platform_etl_backend_spark.engine.session import get_spark
    from platform_etl_backend_spark.catalog import QUERIES

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen + parquet-datasource warm-up outside timing (touches only
    # the 5-row region table, not the benchmarked inputs)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
