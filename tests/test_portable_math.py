"""Cross-engine bit-parity of the portable ln (functions/portable_math.py).

Background: JVM Math.log and DuckDB's libm log differ in the last ulp for
some inputs (ln(3/29), ln(2/44), ...), and ROUND(double, 6) is itself not
tie-portable — so transcendental-heavy models need a log built ONLY from
IEEE-exact primitives. These tests pin (a) exact cross-engine equality on a
dense ratio grid including the inputs that originally diverged, and (b)
accuracy against the reference libm within 1e-12 relative."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.functions.portable_math import (
    duck_portable_ln_ratio,
    portable_ln_ratio,
)

KNOWN_DIVERGENT = [(3, 29), (2, 44), (3, 41)]  # libm ln differs in last ulp


def _grid():
    pairs = [(a, b) for a in range(1, 40) for b in range(1, 40)]
    pairs += KNOWN_DIVERGENT
    pairs += [(1, 10**12), (10**12, 7), (999999937, 999999893), (1, 1), (7, 7)]
    return pairs


def test_bit_identical_across_engines(spark):
    pairs = _grid()
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    duck = con.execute(
        f"SELECT a, b, {duck_portable_ln_ratio('a', 'b')} AS v FROM p ORDER BY a, b"
    ).fetchall()
    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    sp = (
        df.select("a", "b", portable_ln_ratio(F.col("a"), F.col("b")).alias("v"))
        .orderBy("a", "b")
        .collect()
    )
    assert len(duck) == len(sp)
    for (da, db_, dv), r in zip(duck, sp):
        assert (da, db_) == (r["a"], r["b"])
        # EXACT double equality — the whole point of the construction
        assert dv == r["v"], (da, db_, repr(dv), repr(r["v"]))


def test_accuracy_vs_libm(spark):
    pairs = _grid()
    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    rows = df.select(
        "a", "b", portable_ln_ratio(F.col("a"), F.col("b")).alias("v")
    ).collect()
    for r in rows:
        truth = math.log(r["a"] / r["b"])
        assert r["v"] == pytest.approx(truth, abs=1e-12, rel=1e-12)


def test_exact_at_one(spark):
    df = spark.createDataFrame([(5, 5)], "a bigint, b bigint")
    assert df.select(portable_ln_ratio(F.col("a"), F.col("b")).alias("v")).collect()[0][
        "v"
    ] == 0.0
