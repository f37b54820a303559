"""Model-based quality filter: the Spark scorer must match a plain-Python
reimplementation of the committed linear model exactly (integer arithmetic
— zero tolerance), and the threshold/edge behavior must hold."""

from __future__ import annotations

import hashlib

import pytest

from platform_etl_backend_spark.operators.textqa import (
    QUALITY_BIAS_MICRO,
    QUALITY_WEIGHTS_MICRO,
    quality_classifier,
)
from tests.conftest import load


def python_logit_micro(text: str) -> int:
    """Plain-Python twin of hashed_features + dot product (the same model
    scripts/train_quality_weights.py trained against)."""
    buckets: dict[int, int] = {}
    for tok in text.split():
        if not tok:
            continue
        h = hashlib.md5(("fh:" + tok).encode()).hexdigest()
        b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
        buckets[b] = buckets.get(b, 0) + (1 if int(h[2], 16) < 8 else -1)
    return QUALITY_BIAS_MICRO + sum(
        v * QUALITY_WEIGHTS_MICRO[b] for b, v in buckets.items() if v != 0
    )


def test_matches_python_model_on_corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["logit_micro"], r["passed"])
        for r in quality_classifier(docs, "doc_id", "text").collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)  # every doc is scored, none dropped
    for doc_id, text in texts.items():
        want = python_logit_micro(text)
        assert got[doc_id][0] == want, doc_id
        assert got[doc_id][1] == (1 if want >= 0 else 0), doc_id


def test_classifier_separates_labels(spark, sf_dir):
    """The committed weights are a real trained model: accuracy on the
    training objective (distinct-token ratio >= median) must beat chance
    by a wide margin — guards against the weights degenerating into
    all-zeros or sign-flipped commits."""
    docs = load(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    ratios = {
        r["doc_id"]: len(set(r["text"].split())) / max(len(r["text"].split()), 1)
        for r in rows
    }
    med = sorted(ratios.values())[len(ratios) // 2]
    got = {
        r["doc_id"]: r["passed"]
        for r in quality_classifier(docs, "doc_id", "text").collect()
    }
    acc = sum(
        1 for d, ratio in ratios.items() if got[d] == (1 if ratio >= med else 0)
    ) / len(ratios)
    assert acc > 0.7, acc


def test_empty_and_unscored_docs_get_bias_logit(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "join join")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["logit_micro"]
        for r in quality_classifier(df, "doc_id", "text").collect()
    }
    assert got[1] == QUALITY_BIAS_MICRO
    assert got[2] == QUALITY_BIAS_MICRO
    assert got[3] == python_logit_micro("join join")


def test_custom_threshold_and_weights(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a")], ["doc_id", "text"])
    w = tuple([0] * 64)
    got = quality_classifier(
        df, "doc_id", "text", weights_micro=w, bias_micro=5, threshold_micro=6
    ).collect()
    assert all(r["logit_micro"] == 5 and r["passed"] == 0 for r in got)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
