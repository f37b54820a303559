"""Reactome step: pathway ontology → closure-annotated pathway table.

Reference dataflow (``backend/Reactome.scala:13-33`` +
``graph/GraphNode.scala:54-92``):
1. pathways TSV (id, name, species) filtered to Homo sapiens;
2. relations TSV (src parent, dst child) forming a DAG (cycles dropped);
3. per-pathway: ancestors, descendants, children, parents, and all paths
   from roots;
4. joined back onto the pathway labels.

This port computes ancestors/descendants/children/parents with the
DISTRIBUTED iterative closure (operators/graph.py) — scale-safe — and the
root-paths (inherently exponential, only sane for small ontologies) with
the reference-parity driver-side networkx closure.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_backend_spark.operators.graph import closure_tables, driver_closure


def clean_pathways(pathways: DataFrame, species: str = "Homo sapiens") -> DataFrame:
    """Reactome.cleanPathways (Reactome.scala:13-16): positional TSV columns
    renamed, species filter."""
    cols = pathways.columns
    renamed = pathways.select(
        F.col(cols[0]).alias("id"),
        F.col(cols[1]).alias("name"),
        F.col(cols[2]).alias("species"),
    )
    return renamed.where(F.col("species") == species).drop("species")


def reactome_step(
    spark: SparkSession,
    inputs: Mapping[str, DataFrame],
    species: str = "Homo sapiens",
    with_paths: bool = True,
) -> Mapping[str, DataFrame]:
    pathways = clean_pathways(inputs["pathways"], species)
    rel_cols = inputs["relations"].columns
    edges = inputs["relations"].select(
        F.col(rel_cols[0]).alias("src"), F.col(rel_cols[1]).alias("dst")
    )
    # keep only edges between retained pathways (species filter side effect)
    ids = pathways.select(F.col("id").alias("src"))
    edges = (
        edges.join(F.broadcast(ids), "src", "left_semi")
        .join(F.broadcast(ids.withColumnRenamed("src", "dst")), "dst", "left_semi")
    )
    topo = closure_tables(edges, "src", "dst")
    out = pathways.join(topo, "id", "left")
    empty = F.array().cast("array<string>")
    for c in ("ancestors", "descendants", "parents", "children"):
        out = out.withColumn(c, F.coalesce(F.col(c), empty))
    out = out.withColumn(
        "isRoot", F.size("parents") == 0
    ).withColumn("isLeaf", F.size("children") == 0)

    if with_paths:
        info = driver_closure(edges, "src", "dst")
        path_rows = [
            (node, d["paths"]) for node, d in info.items()
        ]
        paths_df = spark.createDataFrame(
            path_rows, "id: string, path: array<array<string>>"
        )
        out = out.join(paths_df, "id", "left").withColumn(
            "path", F.coalesce(F.col("path"), F.array(F.array(F.col("id"))))
        )
    return {"reactome": out}
