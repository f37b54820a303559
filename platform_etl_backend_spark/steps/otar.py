"""Otar step: project↔EFO propagation to all disease ancestors.

Reference semantics (``backend/Otar.scala:21-40``): project metadata
left-joined to the project→EFO lookup, inner-joined to diseases; each
project row is propagated to the disease itself plus every ancestor
(explode of id ∪ ancestors), then grouped per propagated disease id with a
collect_set of project structs (with a derived reference URL).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_otar_info(
    diseases: DataFrame, otar_meta: DataFrame, efo_lookup: DataFrame
) -> DataFrame:
    joined = (
        otar_meta.join(efo_lookup, ["otar_code"], "left")
        .withColumnRenamed("efo_disease_id", "efo_code")
        .join(diseases, F.col("efo_code") == F.col("id"), "inner")
    )
    propagated = joined.withColumn(
        "ancestor", F.explode(F.concat(F.array(F.col("id")), F.col("ancestors")))
    )
    project = F.struct(
        F.col("otar_code").alias("otar_code"),
        F.col("project_status").alias("status"),
        F.col("project_name").alias("project_name"),
        F.col("integrates_in_PPP").cast("boolean").alias("integrates_data_PPP"),
        F.concat(F.lit("http://home.opentargets.org/"), F.col("otar_code")).alias("reference"),
    )
    return (
        propagated.groupBy(F.col("ancestor").alias("efo_id"))
        .agg(F.collect_set(project).alias("projects"))
    )


def otar_step(spark: SparkSession, inputs: Mapping[str, DataFrame]) -> Mapping[str, DataFrame]:
    return {
        "otar_projects": generate_otar_info(
            inputs["diseases"], inputs["otar_meta"], inputs["otar_project_to_efo"]
        )
    }
