from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.streaming import jobs as J


def test_checkpointed_file_sink_recovery(spark, sf_dir, tmp_path):
    """Windowed agg stream → parquet sink with checkpoint; a second start
    from the same checkpoint reprocesses nothing (exactly-once recovery)."""
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = J.read_events_stream(spark, sf_dir)
        out = J.windowed_counts(stream)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    first = spark.read.parquet(sink).count()
    assert first > 0
    # restart from the same checkpoint: input already committed, no dupes
    run_once()
    second = spark.read.parquet(sink).count()
    assert second == first


def test_upsert_replay_fence_skips_committed_batch(spark, tmp_path):
    """Replaying an already-committed micro-batch id must be a no-op, and
    the pointer file must survive a crash between data write and commit
    (the versioned-dir recipe upgraded from the old double-overwrite)."""
    import os

    from platform_etl_backend_spark.streaming import jobs as J

    path = str(tmp_path / "ups")
    rows = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "c", 5.0)],
        "user_id bigint, event_type string, event_ts double",
    )
    # drive the REAL foreachBatch closure like the engine would
    os.makedirs(path, exist_ok=True)
    drive = J.upsert_merge_fn(path, ["user_id"])

    drive(rows, 0)
    t0 = J.current_upsert_table(spark, path).count()
    # replay the same batch id: fence must skip (no new version dir)
    before = sorted(os.listdir(path))
    drive(rows, 0)
    assert sorted(os.listdir(path)) == before
    assert J.current_upsert_table(spark, path).count() == t0
    # a later batch advances the pointer
    rows2 = spark.createDataFrame(
        [(2, "d", 9.0), (3, "e", 1.0)],
        "user_id bigint, event_type string, event_ts double",
    )
    drive(rows2, 1)
    got = {r["user_id"]: r["event_type"] for r in J.current_upsert_table(spark, path).collect()}
    assert got[3] == "e" and got[2] == "d" and 1 in got
