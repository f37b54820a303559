"""Property-based tests (hypothesis): Catalyst implementations of the
engine's column helpers agree with plain-Python reference models on
arbitrary inputs — the rigor tier the reference's test suite lacks
(SURVEY §5: no property-based framework upstream).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from platform_etl_backend_spark.functions import columns as C

label = st.text(alphabet="abc ", min_size=0, max_size=6)
arrays = st.lists(st.one_of(st.none(), label), max_size=5)
maybe_arrays = st.one_of(st.none(), arrays)

SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(x=maybe_arrays, y=maybe_arrays)
@SETTINGS
def test_flatten_cat_model(spark, x, y):
    got = (
        spark.createDataFrame([(x, y)], "x: array<string>, y: array<string>")
        .select(C.flatten_cat("x", "y"))
        .first()[0]
    )
    expected = []
    for arr in (x, y):
        if arr is None:
            continue
        for v in arr:
            if v is not None and v != "" and v not in expected:
                expected.append(v)
    assert got == expected


@given(x=maybe_arrays, y=maybe_arrays)
@SETTINGS
def test_safe_array_union_model(spark, x, y):
    got = (
        spark.createDataFrame([(x, y)], "x: array<string>, y: array<string>")
        .select(C.safe_array_union("x", "y"))
        .first()[0]
    )
    expected = []
    for arr in (x, y):
        for v in arr or []:
            if v not in expected:
                expected.append(v)
    assert got == expected


@given(scores=st.lists(st.floats(min_value=0.0, max_value=100.0,
                                 allow_nan=False), min_size=0, max_size=8))
@SETTINGS
def test_harmonic_fn_model(spark, scores):
    got = (
        spark.createDataFrame([(scores,)], "s: array<double>")
        .select(C.harmonic_fn("s"))
        .first()[0]
    )
    expected = sum(v / (i + 1) ** 2 for i, v in enumerate(sorted(scores, reverse=True)))
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-12)


@given(
    items=st.lists(
        st.tuples(st.sampled_from(["p1", "p2", "p3"]),
                  st.sampled_from(["swiss", "trembl", "ens"])),
        max_size=8,
    )
)
@SETTINGS
def test_priority_dedup_model(spark, items):
    priority = {"swiss": 0, "trembl": 1, "ens": 2}
    rows = [([(i, s) for i, s in items],)]
    got = (
        spark.createDataFrame(rows, "ids: array<struct<id: string, source: string>>")
        .select(C.priority_dedup_array(F.col("ids"), priority).alias("out"))
        .first()
        .out
    )
    ranked = sorted({(priority[s], i, s) for i, s in items})
    expected, seen = [], set()
    for _, i, s in ranked:
        if i not in seen:
            seen.add(i)
            expected.append((i, s))
    assert [(x.id, x.source) for x in got] == expected
