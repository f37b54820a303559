"""EBI search export step: two 3-way inner joins projecting association and
evidence rows (reference: ``backend/SearchEBI.scala:11-42``).

Scale note: targets/diseases are dimension tables — broadcast both sides
onto the large association/evidence facts.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def search_ebi_step(
    spark: SparkSession, inputs: Mapping[str, DataFrame]
) -> Mapping[str, DataFrame]:
    diseases = F.broadcast(inputs["disease"].withColumnRenamed("id", "diseaseId"))
    targets = F.broadcast(inputs["target"].withColumnRenamed("id", "targetId"))
    associations = inputs["association"]
    evidence = inputs["evidence"]

    assoc = (
        associations.join(targets, ["targetId"], "inner")
        .join(diseases, ["diseaseId"], "inner")
        .select(
            "targetId",
            "diseaseId",
            "approvedSymbol",
            "name",
            F.col("associationScore").alias("score"),
        )
    )
    evid = (
        evidence.join(targets, ["targetId"], "inner")
        .join(diseases, ["diseaseId"], "inner")
        .select("targetId", "diseaseId", "approvedSymbol", "name", "score")
    )
    return {"ebisearchAssociations": assoc, "ebisearchEvidence": evid}
