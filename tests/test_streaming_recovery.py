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
