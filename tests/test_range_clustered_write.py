"""Range-clustered output writes (Interaction.scala:440 parity): the
``range_partition_by`` IOResourceConfig option must plan a RangePartitioning
exchange and produce parquet files covering disjoint key ranges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.engine.config import IOResourceConfig
from platform_etl_backend_spark.engine.io import (
    IOResource,
    apply_output_layout,
    write_single,
)
from platform_etl_backend_spark.steps.interaction import interaction_output_configs


def test_config_round_trip_range_fields():
    conf = IOResourceConfig.from_dict(
        {
            "format": "parquet",
            "path": "/tmp/x",
            "write_mode": "overwrite",
            "range_partition_by": ["targetA", "targetB"],
            "range_partitions": 200,
        }
    )
    assert conf.range_partition_by == ("targetA", "targetB")
    assert conf.range_partitions == 200


def test_range_partitions_without_columns_rejected():
    with pytest.raises(ValueError, match="range_partition_by"):
        IOResourceConfig(format="parquet", path="/tmp/x", range_partitions=8)


def test_range_clustering_and_coalesce_are_exclusive():
    with pytest.raises(ValueError, match="coalesce"):
        IOResourceConfig(
            format="parquet",
            path="/tmp/x",
            range_partition_by=("a",),
            coalesce=1,
        )


def test_layout_plans_range_partitioning_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    conf = IOResourceConfig(
        format="parquet",
        path="/tmp/unused",
        range_partition_by=("l_orderkey", "l_linenumber"),
        range_partitions=8,
    )
    plan = (
        apply_output_layout(li, conf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()


def test_write_single_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """End-to-end: writing through the config yields files whose key ranges
    do not overlap — the property that lets a filtered downstream scan skip
    whole files."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    out = str(tmp_path / "clustered")
    conf = IOResourceConfig(
        format="parquet",
        path=out,
        write_mode="overwrite",
        range_partition_by=("l_orderkey",),
        range_partitions=4,
    )
    write_single(IOResource(li, conf))

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    assert 1 < len(per_file) <= 4
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo  # disjoint ranges (boundary keys may touch)
    # round-trip preserves the data
    assert spark.read.parquet(out).count() == li.count()


def test_interaction_output_configs_carry_reference_layout(tmp_path):
    confs = interaction_output_configs(str(tmp_path), n_files=200)
    ev = confs["interaction_evidences"]
    assert ev.range_partition_by == ("targetA", "targetB")
    assert ev.range_partitions == 200
    assert confs["interactions_agg"].coalesce == 200
    assert set(confs) == {
        "interaction_evidences",
        "interactions_agg",
        "interactions_unmatched",
    }
