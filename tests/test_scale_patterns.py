"""Scale-pattern verification: bucketed co-located joins, partitioned-write
pruning, salted aggregation equivalence — the techniques that matter at
100TB, checked at test scale via plan inspection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.plans import explain_str, shuffle_count


def test_bucketed_join_is_colocated(spark, sf_dir, tmp_path):
    """Pre-bucketed tables join with ZERO exchanges — the co-location
    strategy for repeated big-big joins."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("lineitem_b"))
    from platform_etl_backend_spark.engine.session import session_scoped_conf

    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        # force SMJ (at real scale both sides are too big to broadcast)
        with session_scoped_conf(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            plan = explain_str(joined, "simple")
            # co-located: bucketed scans feed the sort-merge join with no
            # hash-partition shuffle on either side
            assert "Exchange hashpartitioning" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert "Bucketed: true" in explain_str(joined, "formatted")
            assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy output + partition-filter scan (S7 + pruning)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "li_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).where(F.col("l_returnflag") == "R")
    plan = explain_str(back, "formatted")
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "l_returnflag" in part_lines[0], plan[:2000]
    expected = li.where(F.col("l_returnflag") == "R").count()
    assert back.count() == expected


def test_salted_agg_matches_plain(spark, sf_dir):
    from platform_etl_backend_spark.catalog import QUERIES

    salted = {
        r.l_returnflag: (r.cnt, r.total_qty, r.max_price)
        for r in QUERIES["q_salted_agg"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r.l_returnflag: (r.cnt, float(r.tq), r.mp)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("tq"),
            F.max("l_extendedprice").alias("mp"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    from platform_etl_backend_spark.operators.skew import salted_broadcast_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    salted = salted_broadcast_join(
        li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey"
    )
    plain = li.join(p, li.l_partkey == p.p_partkey)
    assert salted.count() == plain.count()
    a = salted.groupBy("p_brand").count().collect()
    b = plain.groupBy("p_brand").count().collect()
    assert {(r.p_brand, r["count"]) for r in a} == {(r.p_brand, r["count"]) for r in b}


def test_repartition_by_range_output_clustering(spark, sf_dir):
    """repartitionByRange (Interaction.scala:440) plans a range exchange."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    clustered = li.repartitionByRange(8, "l_orderkey", "l_linenumber")
    assert "Exchange range" in explain_str(clustered, "simple")
    assert shuffle_count(clustered) == 1
