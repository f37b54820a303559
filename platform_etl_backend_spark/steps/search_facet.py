"""Facet-search step: entity documents → searchable facet rows.

Reference (``searchFacet/*``): ~10 facet family extractors over the target
and disease documents, each producing the shared ``Facets`` schema
(label, category, entityIds, datasourceId), unioned by name
(SearchFacet.scala:68-109).
"""

from __future__ import annotations

from functools import reduce
from itertools import chain
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# facet categories (reference.conf searchFacet.categories defaults)
CATEGORIES = {
    "targetId": "Target ID",
    "approvedSymbol": "Approved Symbol",
    "approvedName": "Approved Name",
    "GO_P": "GO:BP", "GO_F": "GO:MF", "GO_C": "GO:CC",
    "subcellularLocation": "Subcellular Location",
    "targetClass": "ChEMBL Target Class",
    "pathways": "Reactome",
    "SM": "Tractability Small Molecule",
    "AB": "Tractability Antibody",
    "PR": "Tractability PROTAC",
    "OC": "Tractability Other Modalities",
    "diseaseName": "Disease",
    "therapeuticArea": "Therapeutic Area",
}

FACET_SCHEMA_COLS = ("label", "category", "entityIds", "datasourceId")


def simple_facet(
    df: DataFrame, label_field: str, category: str, id_field: str,
    datasource_field: str | None = None,
) -> DataFrame:
    """searchFacet/Helpers.scala:24-43: group entity ids per (label, category)."""
    ds = F.col(datasource_field) if datasource_field else F.lit(None).cast("string")
    return (
        df.select(
            F.col(label_field).alias("label"),
            F.lit(category).alias("category"),
            F.col(id_field).alias("id"),
            ds.alias("datasourceId"),
        )
        .where(F.col("label").isNotNull())
        .groupBy("label", "category", "datasourceId")
        .agg(F.collect_set("id").alias("entityIds"))
        .select(*FACET_SCHEMA_COLS)
        .distinct()
    )


def array_facet(
    df: DataFrame, id_field: str, array_field: str, label_expr: str, category: str,
    datasource_expr: str | None = None,
) -> DataFrame:
    """Array-of-structs facet families (TargetFacets flatMap rows → explode)."""
    x = df.select(F.col(id_field).alias("id"), F.explode(array_field).alias("x"))
    ds = F.expr(datasource_expr) if datasource_expr else F.lit(None).cast("string")
    return (
        x.select(
            F.expr(label_expr).alias("label"),
            F.lit(category).alias("category"),
            F.col("id"),
            ds.alias("datasourceId"),
        )
        .where(F.col("label").isNotNull())
        .groupBy("label", "category", "datasourceId")
        .agg(F.collect_set("id").alias("entityIds"))
        .select(*FACET_SCHEMA_COLS)
        .distinct()
    )


def tractability_facets(targets: DataFrame) -> DataFrame:
    """TargetFacets.computeTractabilityFacets: value==true buckets, modality
    mapped through the category LUT."""
    modality_map = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(CATEGORIES[k])) for k in ("SM", "AB", "PR", "OC")
        )
    )
    x = targets.select(
        F.col("id"), F.explode("tractability").alias("t")
    ).where(F.col("t.value") == True)  # noqa: E712
    return (
        x.select(
            F.col("t.id").alias("label"),
            F.coalesce(modality_map[F.col("t.modality")], F.col("t.modality")).alias("category"),
            "id",
        )
        .groupBy("label", "category")
        .agg(F.collect_set("id").alias("entityIds"))
        .withColumn("datasourceId", F.lit(None).cast("string"))
        .select(*FACET_SCHEMA_COLS)
        .distinct()
    )


def compute_target_facets(targets: DataFrame, go: DataFrame) -> DataFrame:
    facets = [
        simple_facet(targets, "id", CATEGORIES["targetId"], "id"),
        simple_facet(targets, "approvedSymbol", CATEGORIES["approvedSymbol"], "id"),
        simple_facet(targets, "approvedName", CATEGORIES["approvedName"], "id"),
    ]
    if "subcellularLocations" in targets.columns:
        facets.append(
            array_facet(targets, "id", "subcellularLocations", "x.location",
                        CATEGORIES["subcellularLocation"], "x.source")
        )
    if "targetClass" in targets.columns:
        facets.append(
            array_facet(targets, "id", "targetClass", "x.label", CATEGORIES["targetClass"])
        )
    if "pathways" in targets.columns:
        facets.append(
            array_facet(targets, "id", "pathways", "x.pathway", CATEGORIES["pathways"])
        )
    if "go" in targets.columns and go is not None:
        go_x = targets.select(F.col("id"), F.explode("go").alias("g"))
        go_labeled = go_x.join(
            F.broadcast(go.select(F.col("id").alias("goId"), F.col("name").alias("goName"))),
            go_x["g.id"] == F.col("goId"),
        )
        aspect_map = F.create_map(
            *chain.from_iterable(
                (F.lit(k), F.lit(CATEGORIES[k])) for k in ("GO_P", "GO_F", "GO_C")
            )
        )
        facets.append(
            go_labeled.select(
                F.col("goName").alias("label"),
                F.coalesce(aspect_map[F.col("g.aspect")], F.col("g.aspect")).alias("category"),
                "id",
            )
            .groupBy("label", "category")
            .agg(F.collect_set("id").alias("entityIds"))
            .withColumn("datasourceId", F.lit(None).cast("string"))
            .select(*FACET_SCHEMA_COLS)
            .distinct()
        )
    if "tractability" in targets.columns:
        facets.append(tractability_facets(targets))
    return reduce(lambda a, b: a.unionByName(b), facets)


def compute_disease_facets(diseases: DataFrame) -> DataFrame:
    facets = [simple_facet(diseases, "name", CATEGORIES["diseaseName"], "id")]
    if "therapeuticAreas" in diseases.columns:
        x = diseases.select(F.col("id"), F.explode("therapeuticAreas").alias("ta"))
        facets.append(simple_facet(x, "ta", CATEGORIES["therapeuticArea"], "id"))
    return reduce(lambda a, b: a.unionByName(b), facets)


def search_facet_step(
    spark: SparkSession, inputs: Mapping[str, DataFrame]
) -> Mapping[str, DataFrame]:
    return {
        "facets_target": compute_target_facets(inputs["targets"], inputs.get("go")),
        "facets_disease": compute_disease_facets(inputs["diseases"]),
    }
