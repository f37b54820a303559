"""Graph-closure operator coverage: distributed transitive closure over a
DAG derived from the ``part`` table (child k → parent k//2, a binary tree),
checked against a DuckDB recursive CTE.

This exercises the engine's iterative-join closure (operators/graph.py),
the Spark-native scale path for the reference's Reactome ontology closure
(graph/GraphNode.scala:54-92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_backend_spark.catalog.registry import register, table
from platform_etl_backend_spark.operators.graph import transitive_closure


@register(
    "q_graph_closure",
    oracle="""
    WITH RECURSIVE anc(node, ancestor) AS (
      SELECT p_partkey, p_partkey // 2 FROM part WHERE p_partkey >= 1
      UNION
      SELECT a.node, a.ancestor // 2 FROM anc a WHERE a.ancestor >= 1)
    SELECT node, COUNT(*) AS n_ancestors,
           array_to_string(list_sort(list(ancestor)), '|') AS ancestors
    FROM anc GROUP BY node
    """,
    description="DAG transitive closure via iterative broadcast hop-joins "
    "(distributed port of GraphNode.scala ancestor derivation). "
    "'|'-serialized output (canonicalizer-proof contract).",
    tags=("graph",),
)
def q_graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    edges = p.where(F.col("p_partkey") >= 1).select(
        F.expr("p_partkey div 2").cast("bigint").alias("src"),  # parent
        F.col("p_partkey").alias("dst"),  # child
    )
    clo = transitive_closure(edges, "src", "dst")
    return clo.groupBy(F.col("descendant").alias("node")).agg(
        F.count(F.lit(1)).alias("n_ancestors"),
        F.concat_ws(
            "|",
            F.transform(F.sort_array(F.collect_set("ancestor")), lambda x: x.cast("string")),
        ).alias("ancestors"),
    )
