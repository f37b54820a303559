"""Physical-layout operators: z-order (Morton) clustering for
multi-dimensional file skipping.

Range clustering (``repartitionByRange`` on one key) gives disjoint file
ranges on THAT key only — a filter on any other column still reads every
file. Z-ordering interleaves the bits of several columns' normalized ranks
into one Morton key and range-clusters on it, so each output file covers a
small hyper-rectangle of the combined key space and min/max footer stats
prune files for filters on ANY prefix-free combination of the z-columns
(the technique Delta Lake / Databricks OPTIMIZE ZORDER applies; here built
from public Spark primitives: min/max broadcast + bitwise Catalyst
expressions + repartitionByRange — no UDFs, no private APIs).

Scale shape: one tiny min/max aggregation broadcast back (2 values per
column), one map-side key computation, one range exchange — identical cost
to plain range clustering regardless of data size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "__zkey"


def _normalize_to_grid(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column to an integer grid cell in [0, 2^bits)."""
    cells = float(2**bits)
    span = (cmax.cast("double") - cmin.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    cell = F.floor(frac * F.lit(cells)).cast("long")
    return F.least(cell, F.lit(int(cells) - 1))


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Attach the Morton key column for ``cols`` and return (df, key_name).

    Each column is normalized to a ``2^bits`` grid against its OWN min/max
    (computed once and broadcast as literals via a 1-row cross join), then
    the grid coordinates' bits are interleaved:
    bit i of column j lands at position ``i * n_cols + j``.
    ``bits * len(cols)`` must stay ≤ 62 (the key is a signed long).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least 2 columns (use range clustering for 1)")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds the 62-bit Morton budget")
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    key: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cell = _normalize_to_grid(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("long")
    out = with_stats.withColumn(_ZKEY, key).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    return out, _ZKEY


def zorder_cluster(
    df: DataFrame, cols: Sequence[str], n_partitions: int, bits: int = 12
) -> DataFrame:
    """Range-cluster rows by their Morton key: each output partition (and
    so each written file) covers a compact hyper-rectangle of the z-column
    space — parquet min/max footers then prune files for selective filters
    on any of the z-columns, not just the first sort key."""
    keyed, key = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_partitions, key)
        .sortWithinPartitions(key)
        .drop(key)
    )
