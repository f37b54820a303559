from __future__ import annotations

import pytest

from platform_etl_backend_spark.streaming import jobs as J


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return J.read_events_stream(spark, sf_dir)


def _batch_events(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    return events_table(spark, sf_dir)


def test_windowed_counts_matches_batch(spark, sf_dir, events_stream):
    from pyspark.sql import functions as F

    out = J.windowed_counts(events_stream)
    q = J.run_to_memory(out, "win_counts")
    try:
        got = {
            (str(r.window_start), r.event_type): r.cnt
            for r in spark.table("win_counts").collect()
        }
        batch = _batch_events(spark, sf_dir)
        expected = {
            (str(r.bucket), r.event_type): r.cnt
            for r in batch.groupBy(
                F.timestamp_seconds(F.expr("(ep div 3600) * 3600")).alias("bucket"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert got == expected
        assert sum(got.values()) == batch.count()
    finally:
        q.stop()


def test_session_windows_bounded(spark, sf_dir, events_stream):
    out = J.session_windows(events_stream, gap="30 minutes")
    q = J.run_to_memory(out, "sessions")
    try:
        rows = spark.table("sessions").collect()
        assert len(rows) > 0
        assert all(r.session_end >= r.session_start for r in rows)
        assert all(r.n_events >= 1 for r in rows)
    finally:
        q.stop()


def test_streaming_dedup(spark, sf_dir, events_stream):
    out = J.streaming_dedup(events_stream)
    q = J.run_to_memory(out, "deduped")
    try:
        n = spark.table("deduped").count()
        assert n == _batch_events(spark, sf_dir).count()  # event_ids unique already
    finally:
        q.stop()


def test_rate_source_soak(spark):
    """Rate-source soak: continuous synthetic stream through a windowed
    aggregation, several micro-batches, verifying sustained progress and
    clean shutdown (the long-running-job smoke the file-replay tests skip)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .option("numPartitions", 2)
        .load()
        .withColumn("bucket", F.col("value") % 10)
    )
    agg = (
        stream.withWatermark("timestamp", "2 seconds")
        .groupBy(F.window("timestamp", "1 second"), "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("rate_soak")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time

        # watermarked aggs interleave no-data commit batches, so count data
        # batches from recentProgress rather than polling lastProgress
        deadline = time.time() + 25
        data_batches = 0
        while time.time() < deadline:
            time.sleep(1)
            data_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
            if data_batches >= 5:
                break
        assert q.isActive and q.exception() is None
        assert data_batches >= 5, "stream did not sustain progress"
        rows = spark.sql("select * from rate_soak").collect()
        assert len(rows) > 0
        assert {r.bucket for r in rows} <= set(range(10))
        assert all(r.cnt > 0 for r in rows)
    finally:
        q.stop()


def test_stream_static_enrichment(spark, sf_dir, events_stream):
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("click", "web"), ("purchase", "commerce"), ("view", "web")],
        ["event_type", "channel"],
    )
    out = J.enrich_with_static(events_stream, dim, on="event_type")
    q = J.run_to_memory(out, "enriched")
    try:
        got = spark.table("enriched")
        assert got.count() == _batch_events(spark, sf_dir).count()
        channels = {
            r.event_type: r.channel
            for r in got.select("event_type", "channel").distinct().collect()
        }
        assert channels["click"] == "web" and channels["purchase"] == "commerce"
        assert channels["error"] is None  # left join keeps unmatched stream rows
    finally:
        q.stop()


def test_foreachbatch_upsert(spark, sf_dir, events_stream, tmp_path):
    from pyspark.sql import functions as F

    path, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    latest_per_user = events_stream.select("user_id", "event_type", "event_ts")
    q = J.upsert_to_parquet(latest_per_user, ["user_id"], path, ckpt)
    q.awaitTermination(120)
    got = J.current_upsert_table(spark, path)
    batch = _batch_events(spark, sf_dir)
    # one row per user, carrying that user's latest event
    assert got.count() == batch.select("user_id").distinct().count()
    expected_latest = (
        batch.groupBy("user_id").agg(F.max("ep").alias("ep")).collect()
    )
    got_ts = {r.user_id: r.event_ts.timestamp() for r in got.collect()}
    for r in expected_latest:
        # ep is epoch seconds truncated; event_ts may carry sub-second
        # precision (micros-encoded testdata). floor is monotonic, so the
        # latest event's floor equals the max of floors.
        assert int(got_ts[r.user_id]) == r.ep


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream range join must produce exactly the pairs
    the equivalent batch join produces (availableNow replay, so no rows are
    dropped as late)."""
    from pyspark.sql import functions as F

    la = J.read_events_stream(spark, sf_dir).where(F.col("event_type") == "view")
    rb = J.read_events_stream(spark, sf_dir).where(F.col("event_type") == "purchase")
    out = J.stream_stream_join(la, rb, watermark="2 hours", within="1 hour")
    q = J.run_to_memory(out, "ssjoin")
    try:
        got = {(r.user_id, r.l_id, r.r_id) for r in spark.table("ssjoin").collect()}
        batch = _batch_events(spark, sf_dir).withColumn(
            "event_ts", F.timestamp_seconds("ep")
        )
        bl = batch.where(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("l_id"), F.col("event_ts").alias("l_ts")
        )
        br = batch.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("r_id"),
            F.col("event_ts").alias("r_ts"),
        )
        cond = (
            (F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour"))
        )
        expected = {
            (r.user_id, r.l_id, r.r_id)
            for r in bl.join(br, cond, "inner").collect()
        }
        assert got == expected
        assert len(got) > 0
    finally:
        q.stop()


def test_streaming_hash_sample_matches_batch(spark, sf_dir, events_stream):
    """Content-hash sampling is a pure map-side filter, so it is
    streaming-safe by construction: the sampled set from a stream replay
    equals the batch sample exactly (seeded df.sample could not promise
    this — its result depends on partitioning)."""
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.operators.sampling import hash_bernoulli_sample

    sampled = hash_bernoulli_sample(
        events_stream.select("event_id", "event_type"), ["event_id"], F.lit(0.25)
    )
    q = J.run_to_memory(sampled, "stream_sample")
    try:
        got = {r.event_id for r in spark.table("stream_sample").collect()}
        batch = _batch_events(spark, sf_dir).select("event_id", "event_type")
        expected = {
            r.event_id
            for r in hash_bernoulli_sample(batch, ["event_id"], F.lit(0.25)).collect()
        }
        assert got == expected and len(got) > 0
    finally:
        q.stop()


def test_sliding_dau_stream_matches_batch(spark, sf_dir, events_stream):
    """Chained stateful operators (dedupe -> windowed count): every report
    day the stream finalizes must carry exactly the batch q_sliding_dau
    count (the batch twin restricted to observed days)."""
    from pyspark.sql import functions as F

    out = J.sliding_dau_stream(events_stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dau7_stream")
        .outputMode("append")  # chained stateful ops require append
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        got = {
            r.report_day.date().toordinal() - 719162: r.dau7  # days since 1970
            for r in spark.table("dau7_stream").collect()
        }
        assert got, "watermark should finalize most of the 30-day fixture"

        batch = _batch_events(spark, sf_dir)
        e = batch.select("user_id", F.expr("ep div 86400").cast("bigint").alias("day")).distinct()
        days = e.select("day").distinct()
        fan = e.select(
            "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
        ).select("user_id", (F.col("day") + F.col("off")).alias("rday"))
        expected = {
            r.rday: r.dau7
            for r in fan.groupBy("rday").agg(F.count_distinct("user_id").alias("dau7")).collect()
        }
        # the stream emits ALL report days below the watermark (incl. fan-out
        # days with no direct activity); each must match the batch fan-out count
        for d, n in got.items():
            assert expected.get(d) == n, (d, n, expected.get(d))
    finally:
        q.stop()


def test_sketch_maintenance_stream_equals_batch_build(spark, sf_dir, events_stream, tmp_path):
    """The incrementally-maintained Bloom/HLL sketch tables must equal the
    one-shot batch builds over the same data — the mergeability guarantee,
    exercised through micro-batch boundaries."""
    from platform_etl_backend_spark.operators.stats import bloom_build, hll_registers
    from platform_etl_backend_spark.streaming.jobs import sketch_maintenance_stream

    base = str(tmp_path / "sketches")
    q = sketch_maintenance_stream(
        events_stream, "user_id", base, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want_bloom = {
        (r["word_idx"], r["bits"]) for r in bloom_build(batch, "user_id").collect()
    }
    got_bloom = {
        (r["word_idx"], r["bits"])
        for r in spark.read.parquet(f"{base}/bloom").collect()
    }
    assert got_bloom == want_bloom
    want_hll = {
        (r["bucket"], r["mx"]) for r in hll_registers(batch, "user_id").collect()
    }
    got_hll = {
        (r["bucket"], r["mx"]) for r in spark.read.parquet(f"{base}/hll").collect()
    }
    assert got_hll == want_hll


def test_topk_maintenance_stream_equals_batch_build(spark, sf_dir, tmp_path):
    """The incrementally-maintained TPUT count table (and the bounds
    derived from it) must equal the one-shot q_distributed_topk batch
    build over the same documents, across REAL micro-batch boundaries
    (the corpus is re-staged as 4 files, one per trigger)."""
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.catalog import QUERIES
    from platform_etl_backend_spark.operators.stats import tput_topk
    from platform_etl_backend_spark.streaming.jobs import topk_maintenance_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = str(tmp_path / "docs_staged")
    docs.withColumn("part", F.pmod(F.col("doc_id"), F.lit(4))).write.partitionBy(
        "part"
    ).parquet(staged)
    stream = (
        spark.readStream.schema(docs.drop("part").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staged}/part=*")
    )
    base = str(tmp_path / "topk")
    q = topk_maintenance_stream(stream, base, str(tmp_path / "ckpt_topk"))
    q.awaitTermination(180)

    from platform_etl_backend_spark.streaming.jobs import current_topk_counts

    counts = current_topk_counts(spark, base)
    want_counts = {
        (r["shard"], r["word"], r["cnt"])
        for r in docs.select(
            (F.col("doc_id") % 8).alias("shard"),
            F.explode(F.split(F.trim("text"), r" +")).alias("word"),
        )
        .groupBy("shard", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    got_counts = {(r["shard"], r["word"], r["cnt"]) for r in counts.collect()}
    assert got_counts == want_counts

    got = [tuple(r) for r in tput_topk(counts, 10).collect()]
    want = [tuple(r) for r in QUERIES["q_distributed_topk"].fn(spark, sf_dir).collect()]
    assert got == want


def test_topk_merge_replay_fence(spark, sf_dir, tmp_path):
    """A replayed micro-batch (same batch_id) must be a no-op — the
    additive merge is fenced by the persisted applied-batch marker."""
    from platform_etl_backend_spark.streaming.jobs import (
        current_topk_counts,
        topk_merge_fn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    base = str(tmp_path / "topk_fence")
    merge = topk_merge_fn(base)
    merge(docs, 0)
    once = {tuple(r) for r in current_topk_counts(spark, base).collect()}
    merge(docs, 0)  # replay: must be skipped
    twice = {tuple(r) for r in current_topk_counts(spark, base).collect()}
    assert twice == once
    merge(docs, 1)  # a NEW batch must still apply
    after = {tuple(r) for r in current_topk_counts(spark, base).collect()}
    assert after != once


def test_topk_merge_crash_before_commit_is_replay_safe(spark, sf_dir, tmp_path):
    """A crash AFTER the versioned data write but BEFORE the atomic
    pointer commit must leave the committed table untouched, and the
    replayed micro-batch must re-apply to the correct final state (the
    ADVICE r6 scenario: the old overwrite-then-marker scheme double-counted
    or lost the table here)."""
    import os

    from platform_etl_backend_spark.streaming.jobs import (
        current_topk_counts,
        topk_merge_fn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    b0, b1 = docs.limit(20), docs.subtract(docs.limit(20))
    base = str(tmp_path / "topk_crash")
    merge = topk_merge_fn(base)
    merge(b0, 0)
    committed = {tuple(r) for r in current_topk_counts(spark, base).collect()}

    # simulate the crash: batch 1's data dir exists, pointer still at 0
    orphan = f"{base}/topk_counts_v1"
    b1.limit(1).selectExpr(
        "CAST(0 AS BIGINT) AS shard", "'garbage' AS word",
        "CAST(999 AS BIGINT) AS cnt"
    ).write.mode("overwrite").parquet(orphan)
    assert {tuple(r) for r in current_topk_counts(spark, base).collect()} == committed

    merge(b1, 1)  # the replay: must re-merge from the COMMITTED table
    got = {tuple(r) for r in current_topk_counts(spark, base).collect()}
    clean_base = str(tmp_path / "topk_clean")
    clean = topk_merge_fn(clean_base)
    clean(b0, 0)
    clean(b1, 1)
    want = {tuple(r) for r in current_topk_counts(spark, clean_base).collect()}
    assert got == want
    assert not any("garbage" in t for t in got)


def test_quantile_maintenance_stream_rank_error_bound(spark, sf_dir, tmp_path):
    """The streamed merged-summary estimates must satisfy the mergeable
    rank-error bound against TRUE ranks over all data seen — the weaker
    twin contract (batch boundaries differ from the batch build's shard
    boundaries, so equality is not expected; the bound is)."""
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.streaming.jobs import (
        current_quantile_summary,
        quantile_estimates_from_summary,
        quantile_maintenance_stream,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("v"),
        F.pmod(F.col("l_orderkey"), F.lit(4)).alias("part"),
    )
    staged = str(tmp_path / "vals_staged")
    li.write.partitionBy("part").parquet(staged)
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staged}/part=*")
    )
    base = str(tmp_path / "quant")
    q = quantile_maintenance_stream(stream, base, str(tmp_path / "ckpt_quant"))
    q.awaitTermination(180)

    summary = current_quantile_summary(spark, base)
    qs = (25, 50, 75, 90)
    est = {
        r["q"]: (r["approx_value"], r["n"], r["err_bound"])
        for r in quantile_estimates_from_summary(summary, qs).collect()
    }
    vals = sorted(r["v"] for r in li.select("v").collect())
    n = len(vals)
    assert est[50][1] == n  # summary weights must sum to the exact count
    import bisect

    for qq in qs:
        approx, _, bound = est[qq]
        target = -(-qq * n // 100)  # ceil
        # true rank range of the approx value among all values
        lo = bisect.bisect_left(vals, approx) + 1
        hi = bisect.bisect_right(vals, approx)
        err = min(abs(lo - target), abs(hi - target))
        assert err <= bound, (qq, approx, target, lo, hi, bound)


def test_quantile_merge_replay_fence_and_crash_safety(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.streaming.jobs import (
        current_quantile_summary,
        quantile_merge_fn,
    )

    vals = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("v")
    ).limit(200)
    base = str(tmp_path / "quant_fence")
    merge = quantile_merge_fn(base)
    merge(vals, 0)
    once = {tuple(r) for r in current_quantile_summary(spark, base).collect()}
    merge(vals, 0)  # replay must be a no-op
    assert {tuple(r) for r in current_quantile_summary(spark, base).collect()} == once
    merge(vals, 1)  # a new batch must apply (weights double)
    after = current_quantile_summary(spark, base)
    assert after.agg(F.sum("w")).collect()[0][0] == 400


# --- first-occurrence novelty stream (rolling Bloom) -------------------------


def _batch_novelty(spark, sf_dir):
    from platform_etl_backend_spark.catalog import QUERIES

    return {
        r["doc_id"]: (r["n_types"], r["n_novel"], r["novelty_micro"])
        for r in QUERIES["q_ngram_novelty"].fn(spark, sf_dir).collect()
    }


def _doc_slices(spark, sf_dir, n_slices=4):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    step = (mx + n_slices) // n_slices
    return [
        docs.where((F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step))
        for i in range(n_slices)
    ]


def test_novelty_merge_equals_batch_across_ordered_batches(spark, sf_dir, tmp_path):
    """Streaming first-occurrence novelty == the q_ngram_novelty batch
    oracle when micro-batches arrive in doc-id order and the Bloom is
    sized so no false positive fires (default 2^20 bits / 4 hashes: FP
    p < 1e-9 at fixture scale). Within-batch firsts are exact; the Bloom
    answers only 'seen in an earlier batch'."""
    from platform_etl_backend_spark.streaming.jobs import (
        current_novelty_table,
        novelty_merge_fn,
    )

    base = str(tmp_path / "novelty")
    merge = novelty_merge_fn(base)
    for i, sl in enumerate(_doc_slices(spark, sf_dir)):
        merge(sl, i)
    got = {
        r["doc_id"]: (r["n_types"], r["n_novel"], r["novelty_micro"])
        for r in current_novelty_table(spark, base).collect()
    }
    assert got == _batch_novelty(spark, sf_dir)


def test_novelty_tiny_bloom_only_undercounts(spark, sf_dir, tmp_path):
    """The documented FP direction: an undersized Bloom (forced false
    positives) may mark truly-novel shingles as seen — streamed n_novel
    <= batch n_novel per doc, NEVER above; n_types stays exact."""
    from platform_etl_backend_spark.streaming.jobs import (
        current_novelty_table,
        novelty_merge_fn,
    )

    base = str(tmp_path / "novelty_tiny")
    merge = novelty_merge_fn(base, m_bits=512, k=2)
    for i, sl in enumerate(_doc_slices(spark, sf_dir)):
        merge(sl, i)
    want = _batch_novelty(spark, sf_dir)
    got = {
        r["doc_id"]: (r["n_types"], r["n_novel"])
        for r in current_novelty_table(spark, base).collect()
    }
    assert set(got) == set(want)
    undercounted = 0
    for doc, (n_types, n_novel) in got.items():
        assert n_types == want[doc][0]
        assert n_novel <= want[doc][1], (doc, n_novel, want[doc][1])
        undercounted += int(n_novel < want[doc][1])
    assert undercounted > 0  # 512 bits MUST collide on this corpus


def test_novelty_replay_fence_and_state_bound(spark, sf_dir, tmp_path):
    """Replayed batch ids are no-ops (append-only outputs need the fence),
    and the rolling-generation state honours the documented memory bound:
    <= generations * m_bits/64 bit-words, oldest generation dropped."""
    from platform_etl_backend_spark.streaming.jobs import (
        _novelty_pointer,
        current_novelty_table,
        novelty_merge_fn,
    )

    base = str(tmp_path / "novelty_fence")
    m_bits, generations = 4096, 2
    merge = novelty_merge_fn(
        base, m_bits=m_bits, k=2, gen_capacity=200, generations=generations
    )
    slices = _doc_slices(spark, sf_dir)
    merge(slices[0], 0)
    once = sorted(map(tuple, current_novelty_table(spark, base).collect()))
    merge(slices[0], 0)  # replay: must be skipped
    assert sorted(map(tuple, current_novelty_table(spark, base).collect())) == once
    for i, sl in enumerate(slices[1:], start=1):
        merge(sl, i)
    ptr = _novelty_pointer(base)
    bloom = spark.read.parquet(f"{ptr[1]}/bloom")
    meta = spark.read.parquet(f"{ptr[1]}/meta")
    gens = sorted(r["gen"] for r in meta.select("gen").distinct().collect())
    assert len(gens) <= generations
    assert gens[-1] > 0  # capacity 200 must have rotated at least once
    assert bloom.count() <= generations * (m_bits // 64)
    # output rows cover every doc exactly once
    out = current_novelty_table(spark, base)
    assert out.count() == out.select("doc_id").distinct().count()


def test_novelty_stream_wrapper_single_batch(spark, sf_dir, tmp_path):
    """novelty_stream end-to-end through writeStream/foreachBatch: one
    availableNow trigger over the whole corpus == the batch oracle (a
    single batch has exact within-batch firsts by construction)."""
    from platform_etl_backend_spark.streaming.jobs import (
        current_novelty_table,
        novelty_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = str(tmp_path / "docs_one")
    docs.coalesce(1).write.parquet(staged)
    stream = spark.readStream.schema(docs.schema).parquet(staged)
    base = str(tmp_path / "novelty_stream")
    q = novelty_stream(stream, base, str(tmp_path / "ckpt_novelty"))
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["n_types"], r["n_novel"], r["novelty_micro"])
        for r in current_novelty_table(spark, base).collect()
    }
    assert got == _batch_novelty(spark, sf_dir)


def test_novelty_old_layout_migration_backfills_history(spark, sf_dir, tmp_path):
    """Round-9 ADVICE (medium): resuming over a PRE-append-layout state dir
    (full merged table in novelty_v{N}/out, nothing under {base}/out) must
    not lose committed history — the first new-layout commit backfills
    ptr/out into out/batch={ptr id} before the reader starts preferring
    the partitioned root."""
    import shutil

    from platform_etl_backend_spark.streaming.jobs import (
        current_novelty_table,
        novelty_merge_fn,
    )

    slices = _doc_slices(spark, sf_dir)

    # ground truth: both batches through the current layout
    ref = str(tmp_path / "nv_ref")
    merge_ref = novelty_merge_fn(ref)
    merge_ref(slices[0], 0)
    merge_ref(slices[1], 1)
    want = sorted(map(tuple, current_novelty_table(spark, ref).collect()))

    # fabricate an old-layout state dir: batch 0's bloom/meta state plus
    # the merged per-doc table INSIDE the version dir, no {base}/out
    scratch = str(tmp_path / "nv_scratch")
    merge_scratch = novelty_merge_fn(scratch)
    merge_scratch(slices[0], 0)
    old = tmp_path / "nv_old"
    shutil.copytree(f"{scratch}/novelty_v0", old / "novelty_v0")
    current_novelty_table(spark, scratch).write.parquet(
        str(old / "novelty_v0" / "out")
    )
    (old / "applied_batch_id").write_text("0\nnovelty_v0")

    merge_old = novelty_merge_fn(str(old))
    merge_old(slices[1], 1)  # first new-layout commit over the old pointer
    got = sorted(map(tuple, current_novelty_table(spark, str(old)).collect()))
    assert got == want  # batch-0 history survived the migration


def test_fenced_readers_never_open_uncommitted_dirs(spark, sf_dir, tmp_path):
    """Round-9 ADVICE (low): a crashed attempt can leave partial/corrupt
    parquet in an uncommitted batch={id} dir; the readers must list only
    the pointer-fenced partitions, so the corrupt footer is never
    scanned."""
    import os

    from platform_etl_backend_spark.streaming.jobs import (
        current_appended_table,
        current_novelty_table,
        fenced_append_fn,
        novelty_merge_fn,
    )

    slices = _doc_slices(spark, sf_dir)

    base = str(tmp_path / "nv_corrupt")
    merge = novelty_merge_fn(base)
    merge(slices[0], 0)
    committed = sorted(map(tuple, current_novelty_table(spark, base).collect()))
    os.makedirs(f"{base}/out/batch=99")
    with open(f"{base}/out/batch=99/part-00000.parquet", "wb") as fh:
        fh.write(b"not a parquet footer")
    got = sorted(map(tuple, current_novelty_table(spark, base).collect()))
    assert got == committed

    abase = str(tmp_path / "append_corrupt")
    fmerge = fenced_append_fn(abase)
    fmerge(slices[0].select("doc_id"), 0)
    want = sorted(map(tuple, current_appended_table(spark, abase).collect()))
    os.makedirs(f"{abase}/out/batch=7")
    with open(f"{abase}/out/batch=7/part-00000.parquet", "wb") as fh:
        fh.write(b"garbage")
    assert sorted(map(tuple, current_appended_table(spark, abase).collect())) == want
