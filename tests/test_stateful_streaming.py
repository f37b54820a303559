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


def test_streaming_funnel_matches_batch_twin(spark, sf_dir):
    """The per-user funnel state machine over the stream must end at the
    same stage as the batch sorted-array fold (operators/sequence)."""
    from platform_etl_backend_spark.catalog.events import events_table
    from platform_etl_backend_spark.operators.sequence import funnel_stages
    from platform_etl_backend_spark.streaming.stateful import funnel_stream

    stages = ("signup", "click", "purchase")
    stream = J.read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type",
        F.col("event_ts").cast("timestamp").cast("bigint").alias("ep"),
    )
    out = funnel_stream(stream, stages=stages)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("funnel_stream_out").collect()
    # one row per user per batch; stage is monotonic, so the final state
    # is the max stage per user
    got = {}
    for r in rows:
        got[r.user_id] = max(got.get(r.user_id, 0), r.funnel_stage)

    batch = funnel_stages(
        events_table(spark, sf_dir), "user_id", "ep", "event_id", "event_type", stages
    )
    expected = {r.user_id: r.funnel_stage for r in batch.collect()}
    # batch covers users with candidate events; streaming only sees those too
    assert got == {u: s for u, s in expected.items() if u in got}
    # and every user with candidate events appears in the stream output
    assert set(got) == set(expected)


def test_streaming_funnel_respects_max_gap(spark, tmp_path):
    """Conversion-window bound enforced across the stream."""
    import pandas as pd
    from platform_etl_backend_spark.streaming.stateful import funnel_stream

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_id": [1, 2, 3, 4, 5, 6],
            "event_type": ["signup", "click", "purchase"] * 2,
            "ep": [0, 100, 9000, 0, 100, 200],  # u1 purchase beyond gap
        }
    )
    src = str(tmp_path / "events_funnel")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, event_type string, ep bigint"
    ).parquet(src)
    out = funnel_stream(stream, max_gap=1000)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_gap_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.funnel_stage for r in spark.table("funnel_gap_out").collect()}
    assert got == {1: 2, 2: 3}
