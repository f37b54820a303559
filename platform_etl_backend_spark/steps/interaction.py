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


# STRING evidence channels → (detection method short name, MI identifier)
# (stringProtein/StringProtein.scala:60-69)
STRING_EVIDENCE_CHANNELS = (
    ("coexpression", "MI:2231"),
    ("cooccurence", "MI:2231"),
    ("neighborhood", "MI:0057"),
    ("fusion", "MI:0036"),
    ("homology", "MI:2163"),
    ("experimental", "MI:0591"),
    ("database", ""),
    ("textmining", "MI:0110"),
)


def prepare_string_interactions(
    string_df: DataFrame, score_threshold: int = 0, taxon_prefix: str = "9606."
) -> DataFrame:
    """Normalize STRING protein links to the common interaction schema.

    Reference semantics (stringProtein/StringProtein.scala:49-120): score
    threshold filter, per-channel evidence structs (only channels with a
    positive score become evidences), human-taxon filter, protein-id prefix
    strip, fixed biological role/source columns.
    """
    df = string_df.withColumn(
        "interactionScore", F.ltrim(F.col("combined_score")).cast("int")
    ).where(F.col("interactionScore") >= score_threshold)
    evidences = F.filter(
        F.array(*[
            F.struct(
                F.lit(name).alias("interaction_detection_method_short_name"),
                F.lit(mi).alias("interaction_detection_method_mi_identifier"),
                F.col(name).cast("long").alias("evidence_score"),
            )
            for name, mi in STRING_EVIDENCE_CHANNELS
        ]),
        lambda e: e["evidence_score"] > 0,
    )
    return (
        df.where(
            F.col("protein1").contains(taxon_prefix)
            & F.col("protein2").contains(taxon_prefix)
        )
        .select(
            F.regexp_replace("protein1", taxon_prefix, "").alias("intA"),
            F.regexp_replace("protein2", taxon_prefix, "").alias("intB"),
            F.lit("ensembl_protein").alias("intA_source"),
            F.lit("ensembl_protein").alias("intB_source"),
            F.lit("unspecified role").alias("intABiologicalRole"),
            F.lit("unspecified role").alias("intBBiologicalRole"),
            F.lit("Homo sapiens").alias("speciesA"),
            F.lit("Homo sapiens").alias("speciesB"),
            F.lit("string").alias("sourceDatabase"),
            (F.col("interactionScore").cast("double") / 1000).alias("interactionScore"),
            evidences.alias("evidencesList"),
        )
    )


def interaction_step(
    spark: SparkSession,
    inputs: Mapping[str, DataFrame],
    string_score_threshold: int = 0,
) -> Mapping[str, DataFrame]:
    interactions = inputs.get("interactions")
    if "string" in inputs:
        normalized = prepare_string_interactions(
            inputs["string"], string_score_threshold
        )
        interactions = (
            normalized
            if interactions is None
            else interactions.unionByName(normalized.select(*interactions.columns))
        )
    mapped = map_interactors(interactions, inputs["mapping"])
    full = add_reverse_interactions(mapped)
    evidences = explode_evidences(full)
    return {
        "interaction_evidences": evidences,
        "interactions_agg": aggregate_interactions(evidences),
    }
