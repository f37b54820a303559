"""Deterministic sampling operators — no RNG, reproducible on any cluster
size and across engines (same philosophy as the md5-bucket train/eval
split): the keep/drop decision is a pure function of row content.

Seeded `df.sample()` is NOT reproducible across partitionings (Spark
documents per-partition seeding), which is why a 100 TB pipeline that must
re-run identically samples by content hash instead.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_uniform(key: Column) -> Column:
    """Uniform-ish value in [0, 1) from the first 2 hex digits of md5(key)
    (256 levels — enough for sampling rates down to ~0.4%; widen the digit
    count for finer rates). The hex-digit arithmetic is portable to any
    engine with md5 + string ops."""
    h = F.md5(key)
    hi = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (hi * 16 + lo) / F.lit(256.0)


def hash_bernoulli_sample(
    df: DataFrame, key_cols: Sequence[str], prob: Column
) -> DataFrame:
    """Keep each row independently with probability ``prob`` (a per-row
    column, so weighted sampling is the same call), decided by content
    hash of ``key_cols``. Pure map-side filter — pushes into the scan
    stage, zero shuffle, identical sample on 1 or 1000 executors."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    return df.where(hash_uniform(key) < prob)


def cap_per_group(
    df: DataFrame, group_cols: Sequence[str], key_cols: Sequence[str], k: int
) -> DataFrame:
    """Domain balancing: keep at most ``k`` rows per group, chosen by
    content-hash rank — the deterministic "cap documents per source/domain"
    operator a training-data mix needs so no domain dominates. Within each
    group this is a uniform exactly-min(k, n) sample; across runs, cluster
    sizes, and partitionings the kept set is identical (no RNG).

    Scale shape: one shuffle on the group key + per-group window rank with
    WindowGroupLimit pushdown (Spark keeps only k rows per partition before
    the final rank) — no global sort, no skew beyond the group key itself.
    """
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    w = Window.partitionBy(*group_cols).orderBy(F.md5(key), *key_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def bottomk_sample(df: DataFrame, key_cols: Sequence[str], k: int) -> DataFrame:
    """Exactly-k uniform sample without RNG: keep the k rows with the
    SMALLEST md5(content) — the deterministic, distributed equivalent of
    reservoir sampling (bottom-k sketch). Each executor keeps a local
    bottom-k, the driver merges k·partitions candidates: Spark plans the
    orderBy+limit as TakeOrderedAndProject, so no global sort materializes.
    Mergeable across shards and identical on any cluster size — properties
    a sequential reservoir cannot offer. Ties broken by the key itself."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    return (
        df.withColumn("_rank_hash", F.md5(key))
        .orderBy("_rank_hash", *key_cols)
        .limit(k)
        .drop("_rank_hash")
    )


def weighted_bottomk_sample(
    df: DataFrame, key_cols: Sequence[str], weight_col: str, k: int
) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement, without RNG —
    Efraimidis & Spirakis (2006) A-ES order sampling, deterministic:
    each row draws ``u`` from its content hash (48 bits of md5, so the
    draw is reproducible at any parallelism) and keeps key
    ``-ln(u)/w`` (an Exponential(w) variate); the k SMALLEST keys are a
    weighted sample without replacement. The ln rides the engine-portable
    ratio log (functions/portable_math.py): ``-ln((h+1)/2^48) =
    ln(2^48/(h+1))``, an integer ratio.

    Spark plans the orderBy+limit as TakeOrderedAndProject — per-partition
    bottom-k then a driver merge of k·partitions candidates, never a
    global sort. Mergeable across shards, cluster-size-invariant, and
    hash-matchable by an oracle — properties a seeded RNG sampler cannot
    offer. Weights must be positive."""
    from platform_etl_backend_spark.functions.portable_math import portable_ln_ratio

    content = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(content), 1, 12), 16, 10).cast("bigint")
    key = portable_ln_ratio(F.lit(2**48), h + 1) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_es_key", key)
        .orderBy("_es_key", *key_cols)
        .limit(k)
        .drop("_es_key")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: Sequence[str],
    fractions: Mapping[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with content-hash determinism — the
    data-mixing primitive (per-language / per-domain keep rates when
    rebalancing a training corpus). The per-row keep probability is a CASE
    over the stratum column, so the whole operator stays one map-side
    filter: zero shuffle, pushes toward the scan, identical sample at any
    parallelism (seeded ``df.sampleBy`` is partitioning-dependent).
    """
    prob = F.lit(float(default))
    for value, frac in sorted(fractions.items()):
        prob = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(prob)
    return hash_bernoulli_sample(df, key_cols, prob)
