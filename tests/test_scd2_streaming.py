"""Streaming SCD2 twin (round-8 VERDICT #7): the applyInPandasWithState
interval chain must equal the batch q_scd2_history on FINALIZED keys, and
the fenced append sink must be replay-safe."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.catalog import QUERIES

SCD2_SCHEMA = "user_id bigint, event_id bigint, event_type string, ep bigint"


def _ordered_chunks(tmp_path, pdf: pd.DataFrame, n: int = 3) -> str:
    """Write event-time-ordered chunk FILES with strictly increasing
    mtimes so the file source replays them as ordered micro-batches."""
    src = str(tmp_path / "scd2_src")
    os.makedirs(src, exist_ok=True)
    pdf = pdf.sort_values(["ep", "event_id"]).reset_index(drop=True)
    for i, chunk in enumerate(np.array_split(pdf, n)):
        p = f"{src}/chunk{i}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return src


def _stream(spark, src):
    return (
        spark.readStream.schema(SCD2_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _batch_closed(spark, sf_dir) -> tuple[set, set]:
    """(stream-finalizable closed rows, pending closed rows).

    A batch-closed interval is STREAM-FINALIZABLE only when the status
    change that closed it (observed on day valid_to+1) was itself
    superseded by a later observed day — the change day is the user's
    current OPEN day otherwise, and a later same-day event could still
    flip its status back, so the stream correctly defers the close."""
    from platform_etl_backend_spark.catalog.events import events_table

    max_day = {
        r.user_id: r.mx
        for r in events_table(spark, sf_dir)
        .where(F.col("user_id") % 17 == 0)
        .groupBy("user_id")
        .agg(F.max(F.expr("ep div 86400")).alias("mx"))
        .collect()
    }
    final, pending = set(), set()
    for r in QUERIES["q_scd2_history"].fn(spark, sf_dir).collect():
        if r.valid_to_day is None:
            continue
        t = (r.user_id, r.status, r.valid_from_day, r.valid_to_day,
             r.last_active_day, r.n_active_days, r.n_events)
        (final if r.valid_to_day + 1 < max_day[r.user_id] else pending).add(t)
    return final, pending


def test_scd2_stream_equals_batch_on_finalized_intervals(spark, sf_dir, tmp_path):
    """3-batch event-time-ordered replay of the fixture slice: the
    stream's emitted (closed) intervals == the batch rows with non-NULL
    valid_to_day; open intervals stay in state, never in the output."""
    from platform_etl_backend_spark.catalog.events import events_table
    from platform_etl_backend_spark.streaming.stateful import scd2_stream

    pdf = (
        events_table(spark, sf_dir)
        .where(F.col("user_id") % 17 == 0)
        .select("user_id", "event_id", "event_type", "ep")
        .toPandas()
    )
    src = _ordered_chunks(tmp_path, pdf)
    out = scd2_stream(_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.status, r.valid_from_day, r.valid_to_day,
         r.last_active_day, r.n_active_days, r.n_events)
        for r in spark.table("scd2_stream_out").collect()
    }
    want, pending = _batch_closed(spark, sf_dir)
    assert want, "fixture must close at least one interval"
    assert got == want
    # the deferred set is exactly the change-on-last-observed-day rows
    assert not (pending & got)


def test_scd2_interval_semantics_unit(spark, tmp_path):
    """Hand-built replay pinning the tricky semantics: an observation GAP
    does not close an interval; a status change on day d closes at d-1;
    a same-day status flip ACROSS micro-batches revises the open day."""
    from platform_etl_backend_spark.streaming.stateful import scd2_stream

    day = 86400
    chunks = [
        pd.DataFrame({"user_id": [1, 1, 1], "event_id": [1, 2, 3],
                      "event_type": ["A", "A", "A"],
                      "ep": [0, 10, 2 * day]}),
        pd.DataFrame({"user_id": [1], "event_id": [4],
                      "event_type": ["B"], "ep": [5 * day + 10]}),
        pd.DataFrame({"user_id": [1, 1], "event_id": [5, 6],
                      "event_type": ["C", "C"],
                      "ep": [5 * day + 20, 6 * day]}),
    ]
    src = str(tmp_path / "scd2_unit")
    os.makedirs(src, exist_ok=True)
    for i, c in enumerate(chunks):
        p = f"{src}/c{i}.parquet"
        c.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    out = scd2_stream(_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_unit_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r.user_id, r.status, r.valid_from_day, r.valid_to_day,
         r.last_active_day, r.n_active_days, r.n_events)
        for r in spark.table("scd2_unit_out").collect()
    ]
    # days 0 and 2 are one 'A' interval (gap survives); day 5's last event
    # is 'C' (the batch-2 'B' is flipped by batch-3's later same-day 'C'),
    # so 'A' closes at 5-1=4 having seen 2 days / 3 events. The open 'C'
    # interval (days 5-6) must NOT be emitted.
    assert rows == [(1, "A", 0, 4, 2, 2, 3)]


def test_fenced_append_sink_replay_and_reader(spark, tmp_path):
    """fenced_append_fn: replayed batch ids are no-ops; the reader unions
    exactly the committed per-batch partitions."""
    from platform_etl_backend_spark.streaming.jobs import (
        current_appended_table,
        fenced_append_fn,
    )

    base = str(tmp_path / "fenced")
    merge = fenced_append_fn(base)
    b0 = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
    b1 = spark.createDataFrame([(3, "z")], "k bigint, v string")
    merge(b0, 0)
    merge(b1, 1)
    first = sorted(map(tuple, current_appended_table(spark, base).collect()))
    assert first == [(1, "x"), (2, "y"), (3, "z")]
    merge(b0, 0)  # replay: must be a no-op
    merge(b1, 1)
    again = sorted(map(tuple, current_appended_table(spark, base).collect()))
    assert again == first
    with pytest.raises(FileNotFoundError):
        current_appended_table(spark, str(tmp_path / "nope"))


def test_scd2_interval_stream_end_to_end(spark, sf_dir, tmp_path):
    """The full job (stateful op -> fenced sink): committed table equals
    the batch finalized set; a checkpointed restart with no new files
    commits nothing new."""
    from platform_etl_backend_spark.catalog.events import events_table
    from platform_etl_backend_spark.streaming.jobs import (
        current_appended_table,
        scd2_interval_stream,
    )

    pdf = (
        events_table(spark, sf_dir)
        .where(F.col("user_id") % 17 == 0)
        .select("user_id", "event_id", "event_type", "ep")
        .toPandas()
    )
    src = _ordered_chunks(tmp_path, pdf)
    base = str(tmp_path / "scd2_tbl")
    ckpt = str(tmp_path / "scd2_ckpt")
    q = scd2_interval_stream(_stream(spark, src), base, ckpt)
    q.awaitTermination(180)
    got = {
        tuple(r)
        for r in current_appended_table(spark, base).collect()
    }
    assert got == _batch_closed(spark, sf_dir)[0]
    # restart on the same checkpoint: no new input => no new commits
    q2 = scd2_interval_stream(_stream(spark, src), base, ckpt)
    q2.awaitTermination(120)
    assert {
        tuple(r) for r in current_appended_table(spark, base).collect()
    } == got


def test_scd2_multi_chunk_batch_sorts_once(spark, tmp_path):
    """Round-9 ADVICE: when one user's micro-batch rows span multiple
    arrow chunks (> maxRecordsPerBatch), days interleave ACROSS chunks —
    the step must concat+sort once per batch, not per chunk, or fold_day
    sees days out of order and emits wrong closed intervals."""
    from platform_etl_backend_spark.streaming.stateful import scd2_stream

    day = 86400
    # one user, 9 rows, days deliberately scrambled in file order so
    # 2-row arrow chunks each straddle non-adjacent days
    days_scrambled = [5, 0, 6, 1, 5, 2, 6, 0, 1]
    pdf = pd.DataFrame({
        "user_id": [1] * 9,
        "event_id": list(range(1, 10)),
        "event_type": ["B" if d >= 5 else "A" for d in days_scrambled],
        "ep": [d * day + i for i, d in enumerate(days_scrambled)],
    })
    src = str(tmp_path / "scd2_chunks")
    os.makedirs(src, exist_ok=True)
    p = f"{src}/c0.parquet"
    pdf.to_parquet(p, index=False)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = scd2_stream(_stream(spark, src))
        q = (
            out.writeStream.format("memory")
            .queryName("scd2_chunked_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    rows = [
        (r.user_id, r.status, r.valid_from_day, r.valid_to_day,
         r.last_active_day, r.n_active_days, r.n_events)
        for r in spark.table("scd2_chunked_out").collect()
    ]
    # sorted truth: days 0-2 are 'A' (3 days, 5 events), closed by the
    # 'B' change on day 5 at 5-1=4; the open 'B' interval is withheld
    assert rows == [(1, "A", 0, 4, 2, 3, 5)]
