"""Multi-dimensional OLAP aggregations: rollup, cube, grouping sets, pivot.

The reference uses none of these (SURVEY §2.4: "no grouping sets / cube /
rollup / pivot — expose Spark's built-ins anyway; zero extra cost"). All
group keys in the test data are non-null, so subtotal rows are
unambiguously identified by NULL keys in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_backend_spark.catalog.registry import register, table, dec2, dbl


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="hierarchical rollup subtotals (engine extension over the reference)",
    tags=("agg", "olap"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dbl(F.sum(dec2("l_quantity"))).alias("sum_qty")
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="full cube over two dimensions (engine extension)",
    tags=("agg", "olap"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        dbl(F.sum(dec2("l_extendedprice"))).alias("total"),
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    description="explicit grouping sets (engine extension)",
    tags=("agg", "olap"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                         FILTER (WHERE l_returnflag = 'A'), 0) AS DOUBLE) AS qty_a,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                         FILTER (WHERE l_returnflag = 'N'), 0) AS DOUBLE) AS qty_n,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                         FILTER (WHERE l_returnflag = 'R'), 0) AS DOUBLE) AS qty_r
    FROM lineitem GROUP BY l_linestatus
    """,
    description="pivot wide aggregation with pinned value columns (engine extension)",
    tags=("agg", "olap", "reshape"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(dec2("l_quantity")))
    )
    return pivoted.select(
        "l_linestatus",
        dbl(F.coalesce(F.col("A"), F.lit(0))).alias("qty_a"),
        dbl(F.coalesce(F.col("N"), F.lit(0))).alias("qty_n"),
        dbl(F.coalesce(F.col("R"), F.lit(0))).alias("qty_r"),
    )
