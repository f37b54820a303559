"""Single-pass table profiling: per-column row/null/distinct counts plus
numeric min/max — the data-quality summary every warehouse engine ships
(engine extension; the reference validates schemas per step via
``validate_df`` but has no profiling surface).

One global aggregation computes every column's metrics in a single pass
over the data (one shuffle), then the wide row is unpivoted with
``stack`` into one row per column. Distinct counts are exact; swap in
``approx_count_distinct`` for trillion-row profiling where HLL error is
acceptable (the call site chooses). Numeric min/max are emitted as
DOUBLE and left NULL for non-numeric columns — never stringified, so no
cross-engine float-formatting hazard (see DEVNOTES determinism notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """Profile every column of ``df``.

    Returns one row per column: (column, n_rows, n_nulls, n_distinct,
    min_val, max_val) with min/max NULL for non-numeric columns.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    branches = []
    for f in df.schema.fields:
        c = f.name
        if isinstance(f.dataType, _NUMERIC):
            mn, mx = f"__mn_{c}", f"__mx_{c}"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        branches.append(
            f"'{c}', __n - __nn_{c}, CAST(__nd_{c} AS BIGINT), {mn}, {mx}"
        )
    n_cols = len(df.schema.fields)
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({n_cols}, {', '.join(branches)}) "
            "AS (column, n_nulls, n_distinct, min_val, max_val)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
    )
