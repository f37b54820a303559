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


def _protobuf_available() -> bool:
    try:  # transformWithState's state-server protocol is protobuf-based
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas requires google.protobuf (not in this "
    "sandbox); the implementation is exercised wherever protobuf exists",
)
def test_transform_with_state_matches_applyinpandas(spark, sf_dir):
    """The transformWithState (Spark 4) port must agree EVENT-FOR-EVENT
    with the applyInPandasWithState implementation on the same replay."""
    from platform_etl_backend_spark.engine.session import session_scoped_conf
    from platform_etl_backend_spark.streaming.stateful import anomaly_flags_tws

    stream = J.read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "value", F.col("ts").alias("ts_ord")
    )
    out = anomaly_flags_tws(stream, threshold_sigma=3.0)
    with session_scoped_conf(spark, {
        # transformWithState requires the RocksDB state store provider
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }):
        q = (
            out.writeStream.format("memory")
            .queryName("anomalies_tws")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    try:
        tws = {
            r.event_id: (r.user_id, r.zscore, r.anomaly)
            for r in spark.table("anomalies_tws").collect()
        }
    finally:
        q.stop()

    out2 = anomaly_flags(stream, threshold_sigma=3.0)
    q2 = (
        out2.writeStream.format("memory")
        .queryName("anomalies_aip")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    try:
        aip = {
            r.event_id: (r.user_id, r.zscore, r.anomaly)
            for r in spark.table("anomalies_aip").collect()
        }
    finally:
        q2.stop()
    assert len(tws) == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert tws == aip
