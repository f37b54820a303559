"""Cross-encoder reranking plumbing: score (query, candidate) text pairs
with an Arrow-batched model stub, keep top-k per query.

The retrieval pattern at scale: a cheap candidate generator (ANN / LSH /
BM25 — all in this repo) bounds the pair set, then an expensive pairwise
scorer reranks only the candidates. The scorer here is STUBBED (no model
runtimes in this environment): a sha256-derived pseudo-score computed in
IEEE double, so the whole pipeline — pair batching through ``mapInPandas``
(the exact shape a torch/onnx cross-encoder uses: Arrow record batches in,
score column out), per-query top-k windowing — is real, tested, and even
oracle-checkable cross-engine. Swap ``_score_impl`` for a model call in
production; everything around it stays.

Scale notes: pairs shuffle once on the query key for the top-k window;
scoring itself is map-side (model weights broadcast per executor in the
real deployment). Candidate-set size per query is the cost knob — it is
bounded upstream by the generator, never quadratic here.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAIR_SEP = "\x1f"  # unit separator: cannot appear in the test corpora


def _score_impl(query_text: str, doc_text: str) -> float:
    """STUB scorer: first 16 bits of sha256(query ␟ doc) scaled to [0, 1).
    Exact in IEEE double — any engine computing the same expression agrees
    bit-for-bit (no rounding needed)."""
    h = hashlib.sha256((query_text + PAIR_SEP + doc_text).encode()).hexdigest()
    return int(h[:4], 16) / 65536.0


def crossencoder_rerank(
    pairs: DataFrame,
    query_id: str,
    doc_id: str,
    query_text: str,
    doc_text: str,
    k: int = 3,
) -> DataFrame:
    """Score candidate pairs (Arrow-batched) and keep the top-k per query,
    ties broken on doc id ascending (deterministic)."""

    schema = f"{query_id} bigint, {doc_id} bigint, score double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            scores = [
                _score_impl(q, d)
                for q, d in zip(pdf[query_text], pdf[doc_text])
            ]
            yield pd.DataFrame(
                {query_id: pdf[query_id], doc_id: pdf[doc_id], "score": scores}
            )

    scored = pairs.select(query_id, doc_id, query_text, doc_text).mapInPandas(
        batches, schema
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(doc_id))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, doc_id, "score", F.col("rk").cast("int").alias("rk"))
    )
