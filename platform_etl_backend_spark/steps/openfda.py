"""OpenFDA FAERS step: adverse-event disproportionality pipeline.

Reference dataflow (``backend/OpenFda.scala:36-62`` + ``openfda/stage/*``):
1. explode raw FAERS reports into (report, drug, reaction) rows with
   qualification filters (PrepareAdverseEventData.scala:14-62);
2. keep only drugs in the reference drug list (inner join on drug_name,
   OpenFdaDataPreparation.scala:24);
3. remove blacklisted events (left_anti, EventsFiltering.scala:10-15);
4. contingency + LLR (PrepareSummaryStatistics/PrepareForMontecarlo);
5. per-drug Monte-Carlo critical values; keep llr > critical value
   (MonteCarloSampling.scala:56-66).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_backend_spark.operators.stats import (
    contingency_via_groupby,
    montecarlo_critical_values,
)


def prepare_events(
    raw: DataFrame,
    report_col: str = "safetyreportid",
    drug_col: str = "drug_name",
    reaction_col: str = "reaction",
) -> DataFrame:
    """Normalize: lower-case drug/reaction, drop nulls, distinct rows."""
    return (
        raw.select(
            F.col(report_col).alias("report"),
            F.lower(F.trim(F.col(drug_col))).alias("drug"),
            F.lower(F.trim(F.col(reaction_col))).alias("reaction"),
        )
        .where(F.col("drug").isNotNull() & F.col("reaction").isNotNull())
        .distinct()
    )


def filter_drugs(events: DataFrame, drug_list: DataFrame, name_col: str = "drug_name") -> DataFrame:
    """Inner join against the curated drug list (broadcast LUT)."""
    lut = F.broadcast(
        drug_list.select(F.lower(F.trim(F.col(name_col))).alias("drug")).distinct()
    )
    return events.join(lut, "drug", "inner")


def filter_blacklist(events: DataFrame, blacklist: DataFrame, event_col: str = "reactions") -> DataFrame:
    """Remove blacklisted reactions (left_anti — EventsFiltering.scala:10-15)."""
    bl = F.broadcast(
        blacklist.select(F.lower(F.trim(F.col(event_col))).alias("reaction")).distinct()
    )
    return events.join(bl, "reaction", "left_anti")


def stratified_sample(
    raw: DataFrame,
    clean: DataFrame,
    significant: DataFrame,
    target_dimension: str,
    sample_size: float = 0.1,
    seed: int | None = 42,
) -> DataFrame:
    """Stratified sample of raw FAERS reports (StratifiedSampling.scala:20-63):
    sample the target dimension's distinct values independently from the
    clean and the significant subsets, full-outer-merge the two strata,
    resolve back to report ids, and keep the matching raw reports.

    Divergence (documented, SURVEY §7.3#2): the reference's ``.sample`` has
    no seed and is acknowledged non-reproducible (README.md:564-569); this
    port seeds it (pass ``seed=None`` for reference behavior).
    """
    kwargs = {"fraction": sample_size}
    if seed is not None:
        kwargs["seed"] = seed
    significant_stratum = significant.select(target_dimension).distinct().sample(**kwargs)
    clean_stratum = clean.select(target_dimension).distinct().sample(**kwargs)
    merged = significant_stratum.join(clean_stratum, [target_dimension], "full").distinct()
    report_ids = (
        clean.select(target_dimension, "safetyreportid")
        .join(merged, [target_dimension])
        .drop(target_dimension)
        .distinct()
    )
    return raw.withColumn("seriousnessdeath", F.lit(1)).join(report_ids, ["safetyreportid"])


def openfda_step(
    spark: SparkSession,
    inputs: Mapping[str, DataFrame],
    permutations: int = 100,
    percentile: float = 0.95,
    sampling_dimension: str | None = None,
    sample_size: float = 0.1,
) -> Mapping[str, DataFrame]:
    events = prepare_events(inputs["fda_events"])
    if "drug_list" in inputs:
        events = filter_drugs(events, inputs["drug_list"])
    if "blacklist" in inputs:
        events = filter_blacklist(events, inputs["blacklist"])

    contingency = contingency_via_groupby(events, "report", "drug", "reaction")
    critvals = montecarlo_critical_values(
        contingency, "drug", permutations=permutations, percentile=percentile
    )
    significant = (
        contingency.join(critvals, "drug")
        .where((F.col("llr") > F.col("critical_value")) & (F.col("A") > 2))
        .select(
            "drug",
            F.col("reaction").alias("event"),
            F.col("A").alias("count"),
            "llr",
            F.col("critical_value").alias("critval"),
        )
    )
    out = {"unfiltered": contingency, "significant": significant}
    if sampling_dimension is not None:
        # OpenFda.scala:55-61: optional stratified sample of the raw reports
        clean = events.withColumnRenamed("report", "safetyreportid")
        sig = significant.withColumnRenamed("drug", sampling_dimension)
        out["stratifiedSampling"] = stratified_sample(
            inputs["fda_events"],
            clean.withColumnRenamed("drug", sampling_dimension),
            sig,
            sampling_dimension,
            sample_size,
        )
    return out
