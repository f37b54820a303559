"""Skew-mitigation operators.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in this engine);
these operators are the explicit fallbacks for the patterns AQE cannot fix:

- ``salted_aggregate``: two-phase aggregation for heavily skewed group keys
  — phase 1 aggregates on (key, salt) spreading each hot key over N
  reducers, phase 2 merges the partials. Semantics-preserving for any
  algebraic aggregate (sum/count/min/max), so it is oracle-checkable
  against the plain groupBy.
- ``salted_broadcast_join``: replicate the small side N times with salt ids
  so a skewed big-side key fans over N tasks (only needed when the small
  side can't broadcast whole and SMJ skews).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash (not rand(), so
    retries/replays and oracle comparisons stay stable)."""
    all_cols = F.concat_ws("\x01", *[F.col(c).cast("string") for c in df.columns])
    return df.withColumn(col_name, F.pmod(F.hash(all_cols), F.lit(buckets)))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (phase1 aggregate over rows,
    phase2 aggregate over phase-1 partials), e.g.::

        {"cnt": (F.count(F.lit(1)), F.sum("cnt")),
         "total": (F.sum(dec2("x")), F.sum("total"))}
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[a1.alias(name) for name, (a1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, buckets: int = 8
) -> DataFrame:
    """Skewed-key join: salt the big side, replicate the small side per salt."""
    big_salted = big.withColumn("_salt", F.pmod(F.hash(F.col(key)), F.lit(buckets)))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_salted.join(replicated, [key, "_salt"]).drop("_salt")
