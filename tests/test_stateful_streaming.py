from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.streaming import jobs as J
from platform_etl_backend_spark.streaming.stateful import anomaly_flags


def test_stateful_anomaly_flags_stream(spark, sf_dir):
    stream = J.read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "value", F.col("ts").alias("ts_ord")
    )
    out = anomaly_flags(stream, threshold_sigma=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("anomalies")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        rows = spark.table("anomalies").collect()
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert len(rows) == n_events  # one verdict per event
        flagged = [r for r in rows if r.anomaly]
        # z-threshold 3.0: anomalies are rare but zscores are populated
        assert all(abs(r.zscore) > 3.0 for r in flagged)
        assert any(r.zscore != 0.0 for r in rows)
        assert len(flagged) < n_events * 0.1
    finally:
        q.stop()
