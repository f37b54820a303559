"""Interaction step: molecular-interaction evidence normalization.

Reference dataflow (``backend/Interaction.scala``): id-mapping union
(:68-106), interactor→gene resolution joined through a truncated-id key
(:220-240), directional swap + union for symmetric sources
(intact/reactome/signor, :242-260), evidence explode (:264-268), and
per-pair aggregation counts (:297-318).

Port notes: the reference's ``getCodeFcn`` Scala UDF (X3, :153-155 — split
the interactor id at '_' then '-') is pure Catalyst here
(``substring_index`` chain), which keeps the mapping join broadcast-able.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SYMMETRIC_SOURCES = ("reactome", "intact", "signor")

_SWAP = {
    "targetA": "targetB", "targetB": "targetA",
    "intA": "intB", "intB": "intA",
    "intA_source": "intB_source", "intB_source": "intA_source",
    "speciesA": "speciesB", "speciesB": "speciesA",
    "intABiologicalRole": "intBBiologicalRole",
    "intBBiologicalRole": "intABiologicalRole",
}


def get_code(c: Column | str) -> Column:
    """Interactor-id truncation as Catalyst (X3): 'P1234-2_x' -> 'P1234'."""
    c = F.col(c) if isinstance(c, str) else c
    return F.substring_index(F.substring_index(c, "_", 1), "-", 1)


def map_interactors(interactions: DataFrame, mapping: DataFrame) -> DataFrame:
    """Resolve intA/intB to gene ids via the (mapped_id → gene_id) LUT."""
    m = F.broadcast(mapping.select("gene_id", "mapped_id").distinct())
    a = interactions.join(m, get_code("intA") == m.mapped_id, "left").withColumn(
        "targetA", F.col("gene_id")
    ).drop("gene_id", "mapped_id")
    mb = F.broadcast(
        mapping.select(
            F.col("gene_id").alias("gene_id_b"), F.col("mapped_id").alias("mapped_id_b")
        ).distinct()
    )
    return (
        a.join(mb, get_code("intB") == F.col("mapped_id_b"), "left")
        .withColumn("targetB", F.col("gene_id_b"))
        .drop("gene_id_b", "mapped_id_b")
    )


def add_reverse_interactions(df: DataFrame) -> DataFrame:
    """Symmetric sources contribute both directions (Interaction.scala:242-260)."""
    reversed_df = df.where(F.col("sourceDatabase").isin(*SYMMETRIC_SOURCES)).select(
        *[F.col(c).alias(_SWAP.get(c, c)) for c in df.columns]
    )
    return df.unionByName(reversed_df)


def explode_evidences(df: DataFrame) -> DataFrame:
    return df.withColumn("evidences", F.explode("evidencesList")).drop("evidencesList")


def aggregate_interactions(evidences: DataFrame) -> DataFrame:
    """Per-pair evidence counts + first score (Interaction.scala:297-318)."""
    return (
        evidences.groupBy(
            "sourceDatabase",
            "targetA", "intA", "intABiologicalRole",
            "targetB", "intB", "intBBiologicalRole",
            "speciesA", "speciesB",
        )
        .agg(
            F.count("evidences").alias("count"),
            F.first("interactionScore").alias("scoring"),
        )
    )


def interaction_step(
    spark: SparkSession, inputs: Mapping[str, DataFrame]
) -> Mapping[str, DataFrame]:
    mapped = map_interactors(inputs["interactions"], inputs["mapping"])
    full = add_reverse_interactions(mapped)
    evidences = explode_evidences(full)
    return {
        "interaction_evidences": evidences,
        "interactions_agg": aggregate_interactions(evidences),
    }
