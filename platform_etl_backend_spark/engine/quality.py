"""In-flight data-quality metrics via Spark's Observation API.

A pipeline at 100 TB cannot afford a second pass over each step's output
just to count rows / nulls for monitoring; ``observe`` attaches metric
aggregates to the SAME job (computed by the existing tasks as rows flow),
so quality telemetry is free. This is the engine's hook for the row-drift
/ null-rate checks an operations team alarms on.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame, null_check_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, Observation]:
    """Attach a standard quality observation: row count plus a null count
    per requested column. Metrics materialize when the returned frame is
    acted on; read them with ``observation.get`` (blocks until the action
    finishes). Zero extra passes, zero extra shuffles.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    min_rows: int = 1,
    max_null_fraction: Mapping[str, float] | None = None,
) -> dict:
    """Validate observed metrics after the action; returns them.

    Raises ValueError on violation — the step runner surfaces this as a
    pipeline failure instead of silently publishing a bad output.
    """
    got = observation.get
    n = got["n_rows"]
    if n < min_rows:
        raise ValueError(f"quality: {n} rows < required {min_rows}")
    for col, frac in (max_null_fraction or {}).items():
        nulls = got.get(f"nulls_{col}", 0)
        if n and nulls / n > frac:
            raise ValueError(
                f"quality: {col} null fraction {nulls / n:.3f} > {frac}"
            )
    return got
