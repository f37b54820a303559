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


def _human_species() -> Column:
    """StringProtein.scala:92-98: fixed human organism struct."""
    return F.struct(
        F.lit("human").alias("mnemonic"),
        F.lit("Homo sapiens").alias("scientificName"),
        F.lit(9606).cast("bigint").alias("taxonId"),
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
            _human_species().alias("speciesA"),
            _human_species().alias("speciesB"),
            F.lit("string").alias("sourceDatabase"),
            (F.col("interactionScore").cast("double") / 1000).alias("interactionScore"),
            evidences.alias("evidencesList"),
        )
    )


def generate_mapping(
    targets: DataFrame, rna_central: DataFrame | None, human_mapping: DataFrame | None
) -> DataFrame:
    """The id-mapping union (Interaction.scala:21-106 generateMapping):
    (gene_id, mapped_id) rows assembled from four sources —
    1. target proteinIds ∪ uniprot human-mapping accessions;
    2. RNAcentral (positional TSV: _c0 mapped id, _c5 gene id);
    3. HGNC dbXRefs ('HGNC:'-prefixed);
    4. human-mapping Gene_Name links resolved through already-mapped ids.
    All four are positional unions (U1, :102) de-duplicated at the end.
    """
    empty = F.array().cast("array<string>")
    pieces: list[DataFrame] = []
    proteins = targets.select(
        F.col("id"), F.coalesce(F.col("proteinIds.id"), empty).alias("proteins")
    )
    if human_mapping is not None:
        hm = (
            human_mapping.filter(F.col("_c1") == "Ensembl")
            .groupBy("_c2")
            .agg(F.collect_list("_c0").alias("mapping_list"))
            .select(F.col("_c2").alias("id"), F.coalesce("mapping_list", empty).alias("mapping_list"))
        )
        merged = (
            proteins.join(hm, ["id"], "left")
            .withColumn(
                "mapped_id_list",
                F.when(F.col("mapping_list").isNull(), F.col("proteins")).otherwise(
                    F.array_union("proteins", "mapping_list")
                ),
            )
            .select(F.col("id").alias("gene_id"), "mapped_id_list")
            .distinct()
        )
    else:
        merged = proteins.select(
            F.col("id").alias("gene_id"), F.col("proteins").alias("mapped_id_list")
        ).distinct()
    exploded = merged.select("gene_id", F.explode("mapped_id_list").alias("mapped_id"))
    pieces.append(exploded)
    if rna_central is not None:
        pieces.append(
            rna_central.select(
                F.col("_c5").alias("gene_id"), F.col("_c0").alias("mapped_id")
            )
        )
    if "dbXRefs" in targets.columns:
        pieces.append(
            targets.select(
                F.col("id").alias("gene_id"),
                F.explode(
                    F.filter(F.col("dbXRefs"), lambda x: x["source"] == "HGNC")
                ).alias("x"),
            ).select("gene_id", F.concat(F.lit("HGNC:"), F.col("x.id")).alias("mapped_id"))
        )
    if human_mapping is not None:
        # Gene_Name links: resolve symbol groups through ids already mapped
        gene_ids = (
            human_mapping.filter(F.col("_c1") == "Gene_Name")
            .groupBy("_c2")
            .agg(F.collect_list("_c0").alias("mapping_list"))
            .select("_c2", F.explode("mapping_list").alias("mapped_id"))
        )
        combo = gene_ids.join(exploded, ["mapped_id"], "left")
        mapped = combo.filter(F.col("gene_id").isNotNull()).drop("mapped_id").distinct()
        unmapped = combo.filter(F.col("gene_id").isNull()).drop("gene_id")
        pieces.append(
            unmapped.join(mapped, ["_c2"]).select("gene_id", "mapped_id").distinct()
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out.distinct()


INTACT_SPECIES = ["mnemonic", "scientific_name", "taxon_id"]


def prepare_intact_interactions(intact: DataFrame) -> DataFrame:
    """IntAct-shaped nested JSON → the common interaction schema
    (Interaction.scala:165-227 generateInteractions, pre-mapping part):
    interactorB falls back to interactorA when absent (self-interaction),
    scores > 1 are rescaled /1000, species re-nested with camelCase names.
    """
    def b_or_a(field: str):
        return F.when(
            F.col(f"interactorB.{field}").isNull(), F.col(f"interactorA.{field}")
        ).otherwise(F.col(f"interactorB.{field}"))

    def species(col: F.Column):
        return F.struct(
            col["mnemonic"].alias("mnemonic"),
            col["scientific_name"].alias("scientificName"),
            col["taxon_id"].alias("taxonId"),
        )

    score = F.col("interaction.interaction_score")
    return intact.select(
        F.col("interactorA.id").alias("intA"),
        F.col("interactorA.id_source").alias("intA_source"),
        species(F.col("interactorA.organism")).alias("speciesA"),
        F.col("interactorA.biological_role").alias("intABiologicalRole"),
        b_or_a("id").alias("intB"),
        b_or_a("id_source").alias("intB_source"),
        species(b_or_a("organism")).alias("speciesB"),
        b_or_a("biological_role").alias("intBBiologicalRole"),
        F.col("source_info.source_database").alias("sourceDatabase"),
        F.col("source_info").alias("interactionResources"),
        F.col("interaction.evidence").alias("evidencesList"),
        F.when(score > 1, score / 1000).otherwise(score).alias("interactionScore"),
    )


def unmatched_report(evidences: DataFrame) -> DataFrame:
    """Interaction.scala:366-383 getUnmatch: evidence rows whose interactors
    failed gene-id resolution, for QC output."""
    return evidences.where(F.col("targetA").isNull() | F.col("targetB").isNull())


def interaction_step(
    spark: SparkSession,
    inputs: Mapping[str, DataFrame],
    string_score_threshold: int = 0,
) -> Mapping[str, DataFrame]:
    interactions = inputs.get("interactions")
    if "intact" in inputs:
        intact_norm = prepare_intact_interactions(inputs["intact"])
        interactions = (
            intact_norm
            if interactions is None
            else interactions.unionByName(intact_norm, allowMissingColumns=True)
        )
    if "string" in inputs:
        normalized = prepare_string_interactions(
            inputs["string"], string_score_threshold
        )
        interactions = (
            normalized
            if interactions is None
            else interactions.unionByName(normalized.select(*interactions.columns))
        )
    if "mapping" in inputs:
        mapping = inputs["mapping"]
    else:
        mapping = generate_mapping(
            inputs["targets"], inputs.get("rna_central"), inputs.get("human_mapping")
        )
    mapped = map_interactors(interactions, mapping)
    full = add_reverse_interactions(mapped)
    evidences = explode_evidences(full)
    return {
        "interaction_evidences": evidences,
        "interactions_agg": aggregate_interactions(evidences),
        "interactions_unmatched": unmatched_report(mapped),
    }
