"""Structured Streaming twins of the batch event operators.

The reference is batch-only (SURVEY §1.1: no streaming anywhere), so these
are engine extensions: the same logical operators (tumbling windows,
session windows, dedup) expressed over unbounded input with watermarks.

Scale notes: watermark bounds state; session windows use Spark's native
``session_window`` (merging state store sessions); streaming dedup keys
must be bounded by the watermark to avoid unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Single source of truth for the events input file: the schema probe and the
# stream's pathGlobFilter must always point at the same file or they desync.
EVENTS_FILE = "events.parquet"

# Probed ts dtype per sf_dir — the footer read is cheap but there is no
# reason to repeat it for every stream over the same directory.
_TS_TYPE_CACHE: dict[str, str] = {}


def _events_ts_type(spark, sf_dir: str) -> str:
    if sf_dir not in _TS_TYPE_CACHE:
        _TS_TYPE_CACHE[sf_dir] = dict(
            spark.read.parquet(f"{sf_dir}/{EVENTS_FILE}").dtypes
        )["ts"]
    return _TS_TYPE_CACHE[sf_dir]


def read_events_stream(spark, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events parquet.

    ``ts`` encoding varies by testdata generation (TIMESTAMP(NANOS) → bigint
    under the legacy conf, TIMESTAMP(MICROS) → timestamp_ntz); probe the
    batch footer schema (cheap, metadata-only, cached per sf_dir) and declare
    the stream schema to match — a file-source stream requires an explicit
    schema.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = _events_ts_type(spark, sf_dir)
    schema = (
        f"event_id bigint, ts {ts_type}, user_id bigint, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", EVENTS_FILE)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(sf_dir)
    )
    if ts_type == "bigint":
        event_ts = F.timestamp_seconds(F.expr("ts div 1000000000"))
    else:
        event_ts = F.col("ts").cast("timestamp")
    return raw.withColumn("event_ts", event_ts)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark (streaming twin of
    q_time_buckets)."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (streaming twin of q_sessionize)."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-style dedup on event_id within the watermark horizon."""
    return events.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_static(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich streaming rows with a (small) static
    dimension. The static side is broadcast — per micro-batch this is a
    map-side hash join with NO streaming state, the scale-correct way to
    attach dimension attributes at any throughput (state-store joins are
    only needed for stream-stream)."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "2 hours",
    within: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream INNER join on user_id with a time-range
    condition (right event within ``within`` AFTER the left event).

    State-boundedness at scale: both sides carry watermarks AND the join
    condition bounds event-time distance, so Spark can evict buffered rows
    once the watermark passes — without the range condition, stream-stream
    join state grows forever. This is the streaming twin of the batch
    as-of/range join family (operators/asof.py).
    """
    l = left.withWatermark("event_ts", watermark).select(
        "user_id",
        F.col("event_id").alias("l_id"),
        F.col("event_ts").alias("l_ts"),
    )
    r = right.withWatermark("event_ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_id"),
        F.col("event_ts").alias("r_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select("user_id", "l_id", "r_id", "l_ts", "r_ts")


def _upsert_pointer(base_path: str) -> tuple[int, str] | None:
    """Read the upsert sink's atomic commit pointer (same contract as
    :func:`_topk_pointer`): (applied_batch_id, data_dir) or None."""
    import os

    marker = f"{base_path}/applied_batch_id"
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        lines = fh.read().strip().splitlines()
    return int(lines[0]), f"{base_path}/{lines[1]}"


def current_upsert_table(spark, base_path: str) -> DataFrame:
    """The committed upsert table — resolves the pointer written by
    :func:`upsert_to_parquet` (never reads staging/uncommitted dirs)."""
    ptr = _upsert_pointer(base_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed upsert table under {base_path}")
    return spark.read.parquet(ptr[1])


def upsert_to_parquet(
    events: DataFrame, key_cols: list[str], path: str, checkpoint: str
):
    """foreachBatch SCD1-upsert sink: each micro-batch's rows replace
    same-key rows in a parquet-backed table (last-write-wins inside a
    batch by highest event_ts) — streaming MERGE INTO for sinks without
    native support; the merge is an anti-join + union, batch-planned per
    micro-batch.

    Commit protocol: the versioned-directory + atomic-pointer recipe of
    :func:`topk_merge_fn` (each merge writes a NEW ``upsert_v{batch_id}``
    dir; data dir and applied batch id commit together in one
    ``os.replace``). The merge itself is idempotent under replay, but the
    previous shape (double mode('overwrite') rewrite of the live dir) had
    a crash window that could destroy the committed table mid-overwrite —
    the same at-least-once hole the round-6 review flagged on the TPUT
    sink. Read the result via :func:`current_upsert_table`; already-
    committed batch ids are skipped (exactly-once effect)."""
    return (
        events.writeStream.foreachBatch(upsert_merge_fn(path, key_cols))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_merge_fn(path: str, key_cols: list[str]):
    """The foreachBatch body for :func:`upsert_to_parquet`, exposed so the
    replay fence and crash-safety are directly testable (the topk_merge_fn
    convention)."""
    import os
    import shutil

    from pyspark.sql import Window

    marker = f"{path}/applied_batch_id"

    def merge(batch: DataFrame, batch_id: int) -> None:
        ptr = _upsert_pointer(path)
        if ptr is not None and batch_id <= ptr[0]:
            return  # replayed batch: already committed, skip
        spark = batch.sparkSession
        w = Window.partitionBy(*key_cols).orderBy(F.col("event_ts").desc())
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if ptr is not None:
            current = spark.read.parquet(ptr[1])
            merged = current.join(
                latest.select(*key_cols), key_cols, "left_anti"
            ).unionByName(latest)
        else:
            merged = latest
        version = f"upsert_v{batch_id}"
        merged.write.mode("overwrite").parquet(f"{path}/{version}")
        os.makedirs(path, exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{batch_id}\n{version}")
        os.replace(tmp, marker)  # the single atomic commit point
        keep = {version, os.path.basename(ptr[1])} if ptr else {version}
        for d in os.listdir(path):
            if d.startswith("upsert_v") and d not in keep:
                shutil.rmtree(f"{path}/{d}", ignore_errors=True)

    return merge


def run_to_memory(df: DataFrame, name: str, timeout_s: int = 120):
    """Drain a bounded file-source stream into an in-memory table (tests)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming and _has_agg(df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def sliding_dau_stream(
    events: DataFrame, window_days: int = 7, watermark: str = "1 day"
) -> DataFrame:
    """Streaming 7-day sliding distinct active users (twin of
    q_sliding_dau) via CHAINED stateful operators — the Spark-4 capability
    the single-operator APIs can't express:

    1. each activity day fans out map-side to the ``window_days`` report
       days it contributes to (sequence + explode, bounded by the window
       length);
    2. streaming ``dropDuplicates`` on (user, report_day) — first stateful
       op — makes each user count once per report day;
    3. a windowed count — second stateful op — emits each finalized
       report day once its watermark passes.

    Chained stateful operators REQUIRE append mode: report days still
    inside the watermark horizon are not emitted until later data (or
    stream end past the delay) finalizes them — the standard completeness/
    latency trade (the batch twin is the completeness oracle in tests).
    """
    day = F.date_trunc("day", F.col("event_ts"))
    fan = events.select(
        "user_id",
        F.explode(
            F.sequence(
                day,
                day + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    dedup = fan.withWatermark("report_day", watermark).dropDuplicates(
        ["user_id", "report_day"]
    )
    return (
        dedup.groupBy(F.window("report_day", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("dau7"))
        .select(F.col("win.start").alias("report_day"), "dau7")
    )


def sketch_maintenance_stream(
    events: DataFrame, key_col: str, base_path: str, checkpoint: str
):
    """foreachBatch INCREMENTAL SKETCH MAINTENANCE — the streaming-warehouse
    pattern the mergeable sketches exist for: each micro-batch computes its
    partial Bloom word table and HLL register table (both O(sketch) rows,
    regardless of batch size), and merges them into parquet-backed sketch
    tables by the sketches' own merge operators (bit_or per word / MAX per
    bucket). The maintained tables are AT ANY MOMENT exactly equal to the
    batch build over all data seen so far — asserted by the twin test —
    because both merges are commutative, associative, and idempotent
    (replayed batches cannot corrupt them; checkpointing plus idempotent
    merge = exactly-once effect).
    """
    import os

    from platform_etl_backend_spark.operators.stats import bloom_build, hll_registers

    def merge_table(spark, new: DataFrame, path: str, key: str, val: str, agg) -> None:
        if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
            current = spark.read.parquet(path)
            merged = current.unionByName(new).groupBy(key).agg(agg.alias(val))
        else:
            merged = new
        tmp = f"{path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(path)

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        merge_table(
            spark,
            bloom_build(batch, key_col),
            f"{base_path}/bloom",
            "word_idx",
            "bits",
            F.expr("bit_or(bits)").cast("bigint"),
        )
        merge_table(
            spark,
            hll_registers(batch, key_col),
            f"{base_path}/hll",
            "bucket",
            "mx",
            F.max("mx"),
        )

    return (
        events.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _topk_pointer(base_path: str) -> tuple[int, str] | None:
    """Read the atomic commit pointer: (applied_batch_id, data_dir) or None."""
    import os

    marker = f"{base_path}/applied_batch_id"
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        lines = fh.read().strip().splitlines()
    return int(lines[0]), f"{base_path}/{lines[1]}"


def current_topk_counts(spark, base_path: str) -> DataFrame:
    """The committed TPUT count table — resolves the atomic pointer file
    written by :func:`topk_merge_fn` (never reads a staging/uncommitted
    version directory)."""
    ptr = _topk_pointer(base_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed topk table under {base_path}")
    return spark.read.parquet(ptr[1])


def topk_merge_fn(base_path: str, shards: int = 8):
    """The foreachBatch body for ``topk_maintenance_stream``, exposed so
    the replay fence is directly testable: merges a document micro-batch's
    per-(shard, word) counts into the parquet-backed TPUT count table.

    Unlike the Bloom/HLL maintenance (bit_or / MAX — naturally
    idempotent), the count merge is ADDITIVE, so a replayed micro-batch
    would double-count. The transactional recipe here is versioned
    directories + ONE atomic pointer commit:

    - each merge writes a NEW directory ``topk_counts_v{batch_id}``
      (never overwrites the committed table);
    - data location AND applied batch id commit together in a single
      ``os.replace`` of the pointer file — atomic on POSIX, so a crash at
      ANY point leaves the previous (data, batch_id) pair intact and the
      replayed micro-batch re-merges from the still-committed table;
    - already-committed batch ids are skipped (idempotent under
      checkpoint replay — exactly-once effect);
    - version dirs older than the committed one's predecessor are
      garbage-collected after the commit (the predecessor survives one
      extra round for in-flight readers).

    On object stores without atomic rename the pointer write is the one
    primitive to swap (e.g. a conditional PUT); the versioned-data shape
    itself needs no rename at all.
    """
    import os
    import shutil

    from platform_etl_backend_spark.operators.dedup import ws_tokens

    marker = f"{base_path}/applied_batch_id"

    def merge(batch: DataFrame, batch_id: int) -> None:
        ptr = _topk_pointer(base_path)
        if ptr is not None and batch_id <= ptr[0]:
            return  # replayed batch: already committed, skip
        spark = batch.sparkSession
        new = (
            batch.select(
                (F.col("doc_id") % shards).alias("shard"),
                F.explode(ws_tokens("text")).alias("word"),
            )
            .groupBy("shard", "word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        if ptr is not None:
            current = spark.read.parquet(ptr[1])
            merged = (
                current.unionByName(new)
                .groupBy("shard", "word")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        else:
            merged = new
        version = f"topk_counts_v{batch_id}"
        merged.write.mode("overwrite").parquet(f"{base_path}/{version}")
        os.makedirs(base_path, exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{batch_id}\n{version}")
        os.replace(tmp, marker)  # the single atomic commit point
        keep = {version, os.path.basename(ptr[1])} if ptr else {version}
        for d in os.listdir(base_path):
            if d.startswith("topk_counts_v") and d not in keep:
                shutil.rmtree(f"{base_path}/{d}", ignore_errors=True)

    return merge


def topk_maintenance_stream(
    docs: DataFrame, base_path: str, checkpoint: str, shards: int = 8
):
    """foreachBatch INCREMENTAL TPUT TOP-K MAINTENANCE — the streaming
    twin of q_distributed_topk: each micro-batch's per-(shard, word)
    counts merge additively into a parquet-backed count table (replay-
    fenced by batch id — see ``topk_merge_fn``), and at any moment
    ``tput_topk(counts)`` equals the batch build over all documents seen
    so far, because per-shard counts are a plain commutative-associative
    sum and the TPUT bound phase is a pure function of them. SCALE: the
    maintained table is vocabulary x shards sized (the same state a
    periodic batch rebuild would scan); each micro-batch contributes a
    map-side partial rollup, never raw rows.
    """
    return (
        docs.writeStream.foreachBatch(topk_merge_fn(base_path, shards))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# --- streaming mergeable-quantile maintenance ------------------------------------


def _summary_pointer(base_path: str) -> tuple[int, str] | None:
    """(applied_batch_id, data_dir) from the quantile pointer, or None."""
    import os

    marker = f"{base_path}/applied_batch_id"
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        lines = fh.read().strip().splitlines()
    return int(lines[0]), f"{base_path}/{lines[1]}"


def current_quantile_summary(spark, base_path: str) -> DataFrame:
    """The committed merged summary (batch_id, v, rn, w, stride) —
    resolves the atomic pointer file written by :func:`quantile_merge_fn`."""
    ptr = _summary_pointer(base_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed quantile summary under {base_path}")
    return spark.read.parquet(ptr[1])


def quantile_merge_fn(base_path: str, value_col: str = "v", keep: int = 32):
    """foreachBatch body for ``quantile_maintenance_stream``: each
    micro-batch contributes a bounded SUMMARY (every stride-th value of
    the batch's sorted order, weighted; stride = ceil(n_b / keep)) which
    appends into the merged summary table — the mergeable-quantile model
    (Greenwald-Khanna/Agarwal et al. mergeability), where each batch
    plays the role of one shard of the batch build (q_mergeable_quantiles).

    The per-batch rank uses the two-pass distributed row_number
    (operators/ranking.py) — a micro-batch never sorts in one partition
    either. Commit is the versioned-dir + atomic-pointer recipe of
    ``topk_merge_fn`` (append-only state is NOT idempotent under
    checkpoint replay, so the same fence applies).

    The maintained invariant (asserted by the twin test): for every
    estimate taken from the merged summary, |true_rank - target_rank|
    <= sum over applied batches of (stride_b - 1) — the corrected
    merged-summary bound q_quantile_rank_error pinned (SUM of per-shard
    stride slack, not max).
    """
    import os
    import shutil

    from platform_etl_backend_spark.operators.ranking import two_pass_row_number

    marker = f"{base_path}/applied_batch_id"

    def merge(batch: DataFrame, batch_id: int) -> None:
        ptr = _summary_pointer(base_path)
        if ptr is not None and batch_id <= ptr[0]:
            return  # replayed batch: already committed
        spark = batch.sparkSession
        vals = batch.select(F.col(value_col).cast("double").alias("v"))
        # owned-lifetime persist (round-7 ADVICE): without the sink, each
        # micro-batch would pin one cached ranged frame in executor
        # storage for the life of the stream.
        ranged_sink: list[DataFrame] = []
        rk = two_pass_row_number(
            vals, ["v"], rn_col="rn", total_col="n_b",
            ranged_sink=ranged_sink,
        )
        stride = F.expr(f"(n_b + {keep} - 1) div {keep}")
        summ = rk.where((F.col("rn") - 1) % stride == 0).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "v",
            F.col("rn").cast("bigint").alias("rn"),
            F.least(stride, F.col("n_b") - F.col("rn") + 1)
            .cast("bigint").alias("w"),
            stride.cast("bigint").alias("stride"),
        )
        merged = (
            spark.read.parquet(ptr[1]).unionByName(summ)
            if ptr is not None else summ
        )
        version = f"summary_v{batch_id}"
        merged.write.mode("overwrite").parquet(f"{base_path}/{version}")
        for fr in ranged_sink:  # write action done — release the cache
            fr.unpersist()
        os.makedirs(base_path, exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{batch_id}\n{version}")
        os.replace(tmp, marker)  # single atomic commit point
        keep_dirs = {version, os.path.basename(ptr[1])} if ptr else {version}
        for d in os.listdir(base_path):
            if d.startswith("summary_v") and d not in keep_dirs:
                shutil.rmtree(f"{base_path}/{d}", ignore_errors=True)

    return merge


def quantile_estimates_from_summary(summary: DataFrame, qs: tuple[int, ...]) -> DataFrame:
    """(q, approx_value, n, err_bound) from a merged summary: estimate =
    min v whose cumulative weight reaches ceil(q·n/100); err_bound =
    Σ_batches (stride_b − 1), the mergeable-summary rank-error bound."""
    from pyspark.sql import Window

    spark = summary.sparkSession
    cum = summary.select(
        "v",
        F.sum("w")
        .over(
            Window.orderBy("v", "batch_id", "rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("cumw"),
    )
    nn = summary.agg(F.sum("w").cast("bigint").alias("n"))
    eb = (
        summary.groupBy("batch_id").agg(F.max("stride").alias("st"))
        .agg(F.sum(F.col("st") - 1).cast("bigint").alias("err_bound"))
    )
    targets = spark.createDataFrame([(q,) for q in qs], "q int")
    return (
        F.broadcast(targets)
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(eb))
        .join(cum, F.col("cumw") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q", "n", "err_bound")
        .agg(F.min("v").alias("approx_value"))
        .select("q", "approx_value", "n", "err_bound")
        .orderBy("q")
    )


def quantile_maintenance_stream(
    values: DataFrame, base_path: str, checkpoint: str,
    value_col: str = "v", keep: int = 32,
):
    """foreachBatch INCREMENTAL QUANTILE-SUMMARY MAINTENANCE — the
    streaming twin of q_mergeable_quantiles, with the WEAKER twin
    contract (rank-error bound, not equality): summaries are mergeable,
    but batch boundaries differ from shard boundaries, so the streamed
    estimate matches the batch build only up to the summed stride slack
    — exactly the bound the twin test asserts against true ranks.
    SCALE: state is O(keep · batches) summary rows; each micro-batch
    contributes a two-pass-ranked bounded sample, never raw rows."""
    return (
        values.writeStream.foreachBatch(
            quantile_merge_fn(base_path, value_col, keep)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# --- streaming first-occurrence n-gram novelty (rolling Bloom) ---------------


def _novelty_pointer(base_path: str) -> tuple[int, str] | None:
    """(applied_batch_id, version_dir) from the novelty pointer, or None."""
    import os

    marker = f"{base_path}/applied_batch_id"
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        lines = fh.read().strip().splitlines()
    return int(lines[0]), f"{base_path}/{lines[1]}"


def _committed_batch_dirs(base_path: str, fence: int) -> list[str]:
    """Paths of the ``out/batch={id}`` partitions with id <= fence. Listing
    explicitly (instead of scanning ``out/`` and filtering after) means an
    UNCOMMITTED dir left by a crashed attempt — possibly holding partial or
    corrupt parquet that would fail the footer scan — is never opened."""
    import os

    out_root = f"{base_path}/out"
    dirs = []
    if os.path.isdir(out_root):
        for d in os.listdir(out_root):
            if not d.startswith("batch="):
                continue
            try:
                bid = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if bid <= fence:
                dirs.append(f"{out_root}/{d}")
    return sorted(dirs)


def current_novelty_table(spark, base_path: str) -> DataFrame:
    """The committed per-doc novelty rows (doc_id, n_types, n_novel,
    novelty_micro) — resolves the atomic pointer written by
    :func:`novelty_merge_fn`."""
    ptr = _novelty_pointer(base_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed novelty table under {base_path}")
    committed = _committed_batch_dirs(base_path, ptr[0])
    if committed:
        # only pointer-fenced partitions are ever opened; basePath keeps
        # the ``batch`` partition column parseable for the drop
        return (
            spark.read.option("basePath", f"{base_path}/out")
            .parquet(*committed)
            .drop("batch")
        )
    return spark.read.parquet(f"{ptr[1]}/out")  # pre-append layout fallback


def novelty_merge_fn(
    base_path: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 4,
    gen_capacity: int | None = None,
    generations: int = 4,
):
    """foreachBatch body for :func:`novelty_stream` — the BOUNDED-STATE
    streaming twin of ``q_ngram_novelty`` (first-occurrence trigram share),
    exposed separately so the replay fence and the Bloom bounds are
    directly testable (the topk_merge_fn convention).

    The batch operator's seen-set is the full distinct-shingle frame —
    unbounded on an endless stream. Here the seen-set is a ROLLING BLOOM
    FILTER:

    - membership state is ``generations`` bit arrays of ``m_bits`` bits
      stored as (gen, word_idx, bits) 64-bit words — AT MOST
      ``generations * m_bits / 64`` rows ever, the documented memory
      bound; inserts go to the CURRENT generation, and when its insert
      count passes ``gen_capacity`` a fresh generation opens and the
      OLDEST is dropped (novelty then means "not seen among the last
      ~generations*gen_capacity shingles" — the crawl-dedup convention).
      ``gen_capacity=None`` never rotates (exact-horizon mode for twin
      testing).
    - k bit positions per shingle come from md5 (content-keyed,
      partitioning-invariant); membership = all k bits set in SOME
      retained generation.
    - FALSE-POSITIVE BOUND: a lookup against a generation holding n_g
      inserts false-positives with p ≈ (1 − e^(−k·n_g/m_bits))^k
      (union-bounded over generations); an FP marks a truly-novel
      shingle as seen, so the streamed ``n_novel`` can only UNDERCOUNT
      the batch oracle — never overcount. No false negatives: every
      inserted shingle stays member until its generation rotates out.
      The twin test pins stream == batch at the default sizing
      (p < 1e-9 on the fixture) and stream <= batch when m_bits is
      forced tiny.
    - within a micro-batch, first-occurrence is EXACT (min doc_id over
      the batch's shingle rollup); the Bloom only answers "seen in any
      EARLIER batch".

    Commit protocol: versioned STATE dirs (bloom words + per-gen meta
    under ``novelty_v{batch_id}``), per-doc rows appended to an immutable
    ``out/batch={id}`` partition (per-batch write cost O(batch), never
    O(history)), then ONE atomic pointer ``os.replace`` — the reader
    filters ``batch <= pointer`` so an uncommitted batch dir is invisible,
    and the replay fence skips already-committed batch ids, exactly like
    the TPUT sink.
    """
    import os
    import shutil

    from platform_etl_backend_spark.operators.dedup import exploded_shingles

    marker = f"{base_path}/applied_batch_id"

    def _positions(df: DataFrame) -> DataFrame:
        """(shingle, i, word_idx, mask) — k md5-derived bit positions."""
        pos_cols = F.array(*[
            F.expr(
                f"CAST(conv(substr(md5(concat('nv{i}:', shingle)), 1, 12), 16, 10)"
                f" AS BIGINT) % {m_bits}"
            )
            for i in range(k)
        ])
        return (
            df.select("shingle", F.posexplode(pos_cols).alias("i", "pos"))
            .select(
                "shingle", "i",
                F.expr("pos div 64").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
                .alias("mask"),
            )
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        ptr = _novelty_pointer(base_path)
        if ptr is not None and batch_id <= ptr[0]:
            return  # replayed batch: already committed
        spark = batch.sparkSession
        sh = exploded_shingles(batch, doc_col, text_col, n)
        n_types = sh.groupBy(doc_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types")
        )
        firsts = sh.groupBy("shingle").agg(
            F.min(doc_col).alias("first_doc")
        ).persist()
        pos = _positions(firsts)
        if ptr is not None:
            state = spark.read.parquet(f"{ptr[1]}/bloom")
            meta = spark.read.parquet(f"{ptr[1]}/meta")
        else:
            state = spark.createDataFrame(
                [], "gen INT, word_idx BIGINT, bits BIGINT"
            )
            meta = spark.createDataFrame([], "gen INT, inserted BIGINT")
        # membership: all k bits set within ONE retained generation
        seen = (
            pos.join(state, "word_idx")
            .where(F.expr("(bits & mask) != 0"))
            .groupBy("shingle", "gen")
            .agg(F.count_distinct("i").alias("nh"))
            .where(F.col("nh") == k)
            .select("shingle")
            .distinct()
        )
        novel = firsts.join(seen, "shingle", "left_anti")
        n_novel = novel.groupBy(F.col("first_doc").alias(doc_col)).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_novel")
        )
        out_new = (
            n_types.join(n_novel, doc_col, "left")
            .na.fill({"n_novel": 0})
            .selectExpr(
                f"CAST({doc_col} AS BIGINT) AS doc_id",
                "n_types",
                "n_novel",
                "CAST((2 * 1000000 * n_novel + n_types) div (2 * n_types)"
                " AS BIGINT) AS novelty_micro",
            )
        )
        # generation bookkeeping (tiny frames — collect is per-gen counts)
        meta_rows = {int(r["gen"]): int(r["inserted"]) for r in meta.collect()}
        cur_gen = max(meta_rows) if meta_rows else 0
        n_new = firsts.count()
        if (
            gen_capacity is not None
            and meta_rows.get(cur_gen, 0) + n_new > gen_capacity
            and meta_rows.get(cur_gen, 0) > 0
        ):
            cur_gen += 1
        keep_gens = set(range(cur_gen - generations + 1, cur_gen + 1))
        meta_rows[cur_gen] = meta_rows.get(cur_gen, 0) + n_new
        meta_rows = {g: c for g, c in meta_rows.items() if g in keep_gens}
        new_bits = (
            _positions(firsts)
            .groupBy("word_idx")
            .agg(F.expr("bit_or(mask)").alias("bits"))
            .select(F.lit(cur_gen).cast("int").alias("gen"), "word_idx", "bits")
        )
        merged_bloom = (
            state.where(F.col("gen").isin(*keep_gens))
            .unionByName(new_bits)
            .groupBy("gen", "word_idx")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        version = f"novelty_v{batch_id}"
        vdir = f"{base_path}/{version}"
        # LAYOUT MIGRATION: a pre-append-layout pointer kept the FULL
        # merged per-doc table inside its version dir (ptr[1]/out). The
        # first new-layout commit must backfill it into the committed-id
        # partition out/batch={ptr id}, or the reader (which prefers
        # out/ once it exists) would silently drop all pre-migration
        # rows — and the old version dir is garbage-collected two
        # commits from now. Idempotent under a crash: re-running the
        # backfill overwrites the same partition with the same rows, and
        # a crash before the pointer commit leaves a reader view equal
        # to the old merged table.
        if (
            ptr is not None
            and os.path.isdir(f"{ptr[1]}/out")
            and not _committed_batch_dirs(base_path, ptr[0])
        ):
            spark.read.parquet(f"{ptr[1]}/out").write.mode("overwrite").parquet(
                f"{base_path}/out/batch={ptr[0]}"
            )
        # per-doc rows are APPEND-ONLY: write ONLY this batch's rows into
        # an immutable batch-addressed partition — per-batch I/O is
        # O(batch), not O(total docs ever emitted) (round-8 ADVICE: the
        # old full-history rewrite was the real unbounded per-batch cost).
        # A crashed attempt's dir is either overwritten on replay (same
        # batch_id, mode=overwrite) or fenced off by the pointer filter
        # in current_novelty_table.
        out_new.write.mode("overwrite").parquet(
            f"{base_path}/out/batch={batch_id}"
        )
        merged_bloom.write.mode("overwrite").parquet(f"{vdir}/bloom")
        spark.createDataFrame(
            [(g, c) for g, c in sorted(meta_rows.items())],
            "gen INT, inserted BIGINT",
        ).write.mode("overwrite").parquet(f"{vdir}/meta")
        firsts.unpersist()
        os.makedirs(base_path, exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{batch_id}\n{version}")
        os.replace(tmp, marker)  # single atomic commit point
        keep_dirs = {version, os.path.basename(ptr[1])} if ptr else {version}
        for d in os.listdir(base_path):
            if d.startswith("novelty_v") and d not in keep_dirs:
                shutil.rmtree(f"{base_path}/{d}", ignore_errors=True)

    return merge


def novelty_stream(
    docs: DataFrame, base_path: str, checkpoint: str,
    doc_col: str = "doc_id", text_col: str = "text", n: int = 3,
    m_bits: int = 1 << 20, k: int = 4,
    gen_capacity: int | None = None, generations: int = 4,
):
    """foreachBatch FIRST-OCCURRENCE NOVELTY maintenance — the streaming
    twin of q_ngram_novelty with the WEAKER twin contract on a rolling
    horizon: equality with the batch oracle while no Bloom false positive
    fires and no generation rotates; <= (undercount only) otherwise, per
    the documented FP bound. SCALE: Bloom state is <= generations*
    m_bits/64 bit-words however long the stream runs; each micro-batch
    costs one shingle rollup + a k-way position join against the word
    table + an O(batch) append into out/batch={id} (the output history
    accumulates on DISK as immutable partitions, but no batch ever
    rewrites it)."""
    return (
        docs.writeStream.foreachBatch(
            novelty_merge_fn(
                base_path, doc_col, text_col, n,
                m_bits=m_bits, k=k,
                gen_capacity=gen_capacity, generations=generations,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# --- fenced append sink (generic; SCD2 interval stream uses it) --------------


def fenced_append_fn(base_path: str):
    """foreachBatch body: append-only exactly-once sink for APPEND-mode
    streams whose rows must not duplicate under micro-batch replay (the
    novelty sink's commit protocol, factored out): each batch's rows land
    in an immutable ``out/batch={id}`` partition, then ONE atomic pointer
    ``os.replace`` commits the batch id. A replayed batch id returns
    early; a crashed attempt's partition is either overwritten on replay
    or fenced off by the reader's ``batch <= pointer`` filter. Per-batch
    I/O is O(batch) — history is never rewritten."""
    import os

    marker = f"{base_path}/applied_batch_id"

    def merge(batch: DataFrame, batch_id: int) -> None:
        ptr = _novelty_pointer(base_path)
        if ptr is not None and batch_id <= ptr[0]:
            return  # replayed batch: already committed
        batch.write.mode("overwrite").parquet(
            f"{base_path}/out/batch={batch_id}"
        )
        os.makedirs(base_path, exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{batch_id}\nout")
        os.replace(tmp, marker)  # single atomic commit point

    return merge


def current_appended_table(spark, base_path: str) -> DataFrame:
    """All rows committed through :func:`fenced_append_fn` (pointer-fenced
    union of the immutable per-batch partitions; uncommitted dirs from a
    crashed attempt are never opened — see :func:`_committed_batch_dirs`)."""
    ptr = _novelty_pointer(base_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed table under {base_path}")
    committed = _committed_batch_dirs(base_path, ptr[0])
    if not committed:
        raise FileNotFoundError(
            f"pointer names batch {ptr[0]} but no committed partition under "
            f"{base_path}/out"
        )
    return (
        spark.read.option("basePath", f"{base_path}/out")
        .parquet(*committed)
        .drop("batch")
    )


def scd2_interval_stream(
    events: DataFrame, base_path: str, checkpoint: str
):
    """Streaming SCD2 maintenance job — the per-user validity-interval
    chain (streaming/stateful.scd2_stream) draining CLOSED intervals into
    a fenced append-only table. The committed table equals the batch
    q_scd2_history rows with non-NULL valid_to_day on the same replay,
    minus closes whose change day is still the user's open day (see the
    scd2_stream twin contract); state is O(1) per user."""
    from platform_etl_backend_spark.streaming.stateful import scd2_stream

    return (
        scd2_stream(events)
        .writeStream.foreachBatch(fenced_append_fn(base_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
