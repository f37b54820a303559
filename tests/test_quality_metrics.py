"""Observation-API quality metrics: free in-flight telemetry + gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.engine.quality import assert_quality, with_quality_metrics


def test_metrics_ride_the_action(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out, obs = with_quality_metrics(
        li.where(F.col("l_quantity") > 10), null_check_cols=("l_returnflag",)
    )
    n = out.count()  # ONE action: metrics computed by the same job
    got = assert_quality(obs, min_rows=1, max_null_fraction={"l_returnflag": 0.0})
    assert got["n_rows"] == n
    assert got["nulls_l_returnflag"] == 0


def test_quality_gate_fires_on_violation(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "v"])
    out, obs = with_quality_metrics(df, null_check_cols=("v",))
    out.count()
    with pytest.raises(ValueError, match="null fraction"):
        assert_quality(obs, max_null_fraction={"v": 0.25})


def test_min_rows_gate(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/nation.parquet").where(F.lit(False))
    out, obs = with_quality_metrics(d)
    out.count()
    with pytest.raises(ValueError, match="rows"):
        assert_quality(obs, min_rows=1)
