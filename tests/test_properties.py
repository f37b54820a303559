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

label = st.text(alphabet="abc, ", min_size=0, max_size=6)
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
            if v is None:
                continue
            v = v.strip().replace(",", "")  # Helpers.scala:154-167 normalization
            if v != "" and v not in expected:
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


# ---------------------------------------------------------------------------
# Sequence-operator properties: the Spark fold/window implementations must
# agree with direct plain-Python models on arbitrary event streams
# (randomized timestamps INCLUDING ties, multiple users, shuffled input
# order — the adversarial cases for ordered-sequence semantics).
# ---------------------------------------------------------------------------

_event_streams = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # user
        st.integers(min_value=0, max_value=50),    # ep (small range → many ties)
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=25,
)


def _py_funnel(events, stages, max_gap=None):
    """Reference model: sequential scan of (ep, event_id)-sorted events."""
    out = {}
    by_user = {}
    for eid, (u, ep, t) in enumerate(events):
        by_user.setdefault(u, []).append((ep, eid, t))
    for u, evs in by_user.items():
        stage, anchor = 0, None
        for ep, _eid, t in sorted(evs):
            if stage < len(stages) and t == stages[stage]:
                if stage == 0 or (
                    ep > anchor and (max_gap is None or ep <= anchor + max_gap)
                ):
                    stage, anchor = stage + 1, ep
        out[u] = stage
    return out


@SETTINGS
@given(events=_event_streams, gapped=st.booleans())
def test_funnel_fold_matches_python_model(spark, events, gapped):
    from platform_etl_backend_spark.operators.sequence import funnel_stages

    stages = ("signup", "click", "purchase")
    max_gap = 10 if gapped else None
    rows = [(u, eid, ep, t, 0.0) for eid, (u, ep, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ep bigint, event_type string, value double"
    )
    got = {
        r["user_id"]: r["funnel_stage"]
        for r in funnel_stages(
            df, "user_id", "ep", "event_id", "event_type", stages, max_gap=max_gap
        ).collect()
    }
    expected = _py_funnel(events, stages, max_gap)
    # users with no candidate (funnel-type) events are pre-filtered out of
    # the Spark frame; the model gives them stage 0 — align domains
    expected = {
        u: s for u, s in expected.items()
        if any(e[0] == u and e[2] in stages for e in events)
    }
    assert got == expected


@SETTINGS
@given(events=_event_streams)
def test_scd2_matches_python_model(spark, events):
    from platform_etl_backend_spark.operators.sequence import scd2_intervals

    rows = [(u, eid, ep, t, 0.0) for eid, (u, ep, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ep bigint, event_type string, value double"
    )
    got = sorted(
        (r["user_id"], r["version"], r["state"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in scd2_intervals(df, "user_id", "ep", "event_id", "event_type").collect()
    )

    expected = []
    by_user = {}
    for eid, (u, ep, t) in enumerate(events):
        by_user.setdefault(u, []).append((ep, eid, t))
    for u, evs in by_user.items():
        runs = []
        for ep, _eid, t in sorted(evs):
            if runs and runs[-1][0] == t:
                runs[-1][2] += 1
            else:
                runs.append([t, ep, 1])
        for i, (state, vfrom, nev) in enumerate(runs):
            vto = runs[i + 1][1] if i + 1 < len(runs) else None
            expected.append((u, i + 1, state, vfrom, vto, nev))
    assert got == sorted(expected)


# ---------------------------------------------------------------------------
# Round-4 operators: sentence segmentation + BPE vs plain-Python models
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=1, max_size=12
)


@given(tokens=_words, punct=st.lists(st.sampled_from([".", "!", "?", ""]), min_size=12, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sentence_split_token_conservation(spark, tokens, punct):
    """Segmentation never loses or invents tokens: the per-sentence token
    counts sum to the punctuated text's token count, sentence ids are
    1..n in order, and re-joining sentences reproduces the text minus the
    boundary whitespace."""
    from platform_etl_backend_spark.operators.textqa import segment_sentences

    text = " ".join(t + p for t, p in zip(tokens, punct))
    df = spark.createDataFrame([(1, text)], "doc_id: bigint, text: string")
    rows = sorted(segment_sentences(df, "doc_id", "text").collect(),
                  key=lambda r: r.sent_id)
    assert [r.sent_id for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r.n_tokens for r in rows) == len(tokens)
    assert " ".join(r.sentence for r in rows) == text


@given(words=st.lists(st.text(alphabet="ab", min_size=1, max_size=4),
                      min_size=2, max_size=8))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_train_matches_reference_on_random_corpora(spark, words):
    """BPE merges and final vocab equal the plain-Python Sennrich model on
    random ab-alphabet corpora (small alphabet maximizes merge collisions
    and tie-breaks — the hard cases)."""
    from collections import Counter

    from platform_etl_backend_spark.operators.bpe import bpe_train
    from tests.test_bpe import _ref_bpe

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id: bigint, text: string")
    ref_merges, ref_vocab = _ref_bpe(dict(Counter(words)), 3)
    merges, vocab = bpe_train(df, "doc_id", "text", n_merges=3)
    got = [(r.lhs, r.rhs, r.cnt) for r in merges.orderBy("round").collect()]
    assert got == ref_merges[: len(got)]
    got_vocab = {r.word: r.units.strip().split("  ") for r in vocab.collect()}
    assert got_vocab == ref_vocab


_intervals = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(0, 120)),
    min_size=0, max_size=12,
)


@given(a_raw=_intervals, b_raw=_intervals)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_overlap_matches_quadratic_model(spark, a_raw, b_raw):
    """Grid-blocked interval overlap == the plain quadratic definition for
    random keyed interval sets (spans freely crossing many grid cells;
    touching endpoints included with overlap 0)."""
    from platform_etl_backend_spark.operators.asof import interval_overlap_join

    a_rows = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(a_raw)]
    b_rows = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(b_raw)]
    a = spark.createDataFrame(
        a_rows, "k: bigint, a_id: bigint, a_start: bigint, a_end: bigint"
    ) if a_rows else spark.createDataFrame([], "k bigint, a_id bigint, a_start bigint, a_end bigint")
    b = spark.createDataFrame(
        b_rows, "k: bigint, b_id: bigint, b_start: bigint, b_end: bigint"
    ) if b_rows else spark.createDataFrame([], "k bigint, b_id bigint, b_start bigint, b_end bigint")
    out = {(r.a_id, r.b_id): r.overlap
           for r in interval_overlap_join(
               a, b, ["k"], "a_start", "a_end", "b_start", "b_end", bucket=32
           ).collect()}
    expect = {}
    for (k1, ai, s1, e1) in a_rows:
        for (k2, bi, s2, e2) in b_rows:
            if k1 == k2 and s1 <= e2 and s2 <= e1:
                expect[(ai, bi)] = min(e1, e2) - max(s1, s2)
    assert out == expect


vec_elems = st.floats(min_value=-10, max_value=10,
                      allow_nan=False, allow_infinity=False, width=32)


@given(data=st.data())
@SETTINGS
def test_cosine_pre_bit_identical_to_cosine(spark, data):
    """The round-9 pair-join optimization contract: cosine_pre with
    per-vector precomputed norms must equal cosine(a, b) BIT-FOR-BIT on
    arbitrary vectors (norm(x) is the same IEEE left-fold wherever it is
    evaluated) — this is why all 16 affected oracles stayed hash-green
    with zero tolerance. Any future 'optimization' that reorders the fold
    (e.g. pairwise/tree summation) fails here, not in a 6-dp oracle."""
    from platform_etl_backend_spark.operators import similarity as S

    dim = data.draw(st.integers(min_value=1, max_value=8))
    nonzero = st.lists(vec_elems, min_size=dim, max_size=dim).filter(
        lambda v: any(x != 0 for x in v)  # ANSI mode: 0-norm divides throw
    )
    a = data.draw(nonzero)
    b = data.draw(nonzero)
    row = (
        spark.createDataFrame([(a, b)], "a: array<double>, b: array<double>")
        .select(
            S.cosine(F.col("a"), F.col("b")).alias("plain"),
            S.cosine_pre(
                F.col("a"), F.col("b"), S.norm(F.col("a")), S.norm(F.col("b"))
            ).alias("pre"),
        )
        .first()
    )
    # bit-for-bit comparison via the raw IEEE bytes
    import struct

    def bits(x):
        return None if x is None else struct.pack(">d", x)

    assert bits(row["plain"]) == bits(row["pre"])
