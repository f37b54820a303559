"""Cross-encoder reranking: score (query, candidate) text pairs with an
Arrow-batched scorer, keep top-k per query.

The retrieval pattern at scale: a cheap candidate generator (ANN / LSH /
BM25 — all in this repo) bounds the pair set, then an expensive pairwise
scorer reranks only the candidates. TWO scorers ship:

- ``transformer`` (the REAL scoring path, default for
  ``transformer_rerank``): a complete single-layer transformer
  cross-encoder forward pass in numpy — hashed-vocab embeddings +
  positional + segment embeddings over the [CLS] query [SEP] doc
  sequence, 2-head scaled-dot-product self-attention with padding
  masks, residual + layernorm, tanh FFN, residual + layernorm, sigmoid
  head on the CLS vector. Weights are committed by construction
  (deterministically generated from a fixed seed at import — the same
  bits every process, everywhere); scoring batches ride ``mapInPandas``
  exactly as a torch/onnx model would (weights broadcast per executor,
  Arrow record batches in, score column out). Swap ``_forward`` for a
  real checkpoint in production; everything around it stays.
- ``hash`` (the cross-engine TEST twin): sha256-derived IEEE-double
  pseudo-scores — expressible in SQL, so the whole pipeline is
  oracle-checkable end to end (q_crossencoder_rerank). Not a model;
  kept because an engine-portable scorer is the only way a DuckDB
  oracle can hash-match the pandas-UDF stage.

Scale notes: pairs shuffle once on the query key for the top-k window;
scoring itself is map-side. Candidate-set size per query is the cost
knob — bounded upstream by the generator, never quadratic here.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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


# --- numpy transformer cross-encoder ---------------------------------------------

_D, _V, _L, _H, _FF = 16, 64, 16, 2, 32
_CLS, _SEP = 0, 1  # reserved vocab ids; hashed tokens land in [2, _V)
_EPS = 1e-5


def _init_weights() -> dict[str, np.ndarray]:
    """Committed-by-construction weights: generated from a FIXED seed with
    a FIXED generator (PCG64), so every process on every machine gets the
    identical float64 bits — equivalent to checking in the arrays, without
    a 50 KB literal blob."""
    rng = np.random.default_rng(20260815)
    s = 0.25

    def m(*shape):
        return rng.standard_normal(shape) * s

    return {
        "emb": m(_V, _D), "pos": m(_L, _D), "seg": m(3, _D),
        "wq": m(_D, _D), "wk": m(_D, _D), "wv": m(_D, _D), "wo": m(_D, _D),
        "ff1": m(_D, _FF), "b1": np.zeros(_FF), "ff2": m(_FF, _D),
        "b2": np.zeros(_D), "head_w": m(_D), "head_b": 0.0,
    }


_W = _init_weights()


def _token_ids(query_text: str, doc_text: str) -> tuple[list[int], list[int]]:
    """[CLS] q… [SEP] d… truncated to _L, + segment ids (0 cls, 1 q, 2 d)."""
    def bucket(tok: str) -> int:
        return 2 + int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % (_V - 2)

    ids = [_CLS]
    segs = [0]
    for tok in query_text.split():
        ids.append(bucket(tok)); segs.append(1)
    ids.append(_SEP); segs.append(1)
    for tok in doc_text.split():
        ids.append(bucket(tok)); segs.append(2)
    return ids[:_L], segs[:_L]


def _forward(ids_batch: list[list[int]], segs_batch: list[list[int]]) -> np.ndarray:
    """Batched single-layer transformer forward pass → sigmoid scores.

    Vectorized float64 numpy (einsum attention, padding masks); the pytest
    pins it against an independent pure-python (math module, list loops)
    implementation of the identical architecture.
    """
    W = _W
    B = len(ids_batch)
    lens = np.array([len(x) for x in ids_batch])
    Lm = int(lens.max())
    ids = np.zeros((B, Lm), dtype=np.int64)
    segs = np.zeros((B, Lm), dtype=np.int64)
    mask = np.zeros((B, Lm), dtype=bool)
    for i, (a, g) in enumerate(zip(ids_batch, segs_batch)):
        ids[i, : len(a)] = a
        segs[i, : len(a)] = g
        mask[i, : len(a)] = True
    x = W["emb"][ids] + W["pos"][:Lm][None, :, :] + W["seg"][segs]

    def layernorm(t):
        mu = t.mean(axis=-1, keepdims=True)
        var = ((t - mu) ** 2).mean(axis=-1, keepdims=True)
        return (t - mu) / np.sqrt(var + _EPS)

    dk = _D // _H
    q = (x @ W["wq"]).reshape(B, Lm, _H, dk)
    k = (x @ W["wk"]).reshape(B, Lm, _H, dk)
    v = (x @ W["wv"]).reshape(B, Lm, _H, dk)
    att = np.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(dk)
    att = np.where(mask[:, None, None, :], att, -1e30)
    att = att - att.max(axis=-1, keepdims=True)
    e = np.exp(att)
    p = e / e.sum(axis=-1, keepdims=True)
    ctx = np.einsum("bhij,bjhd->bihd", p, v).reshape(B, Lm, _D)
    x = layernorm(x + ctx @ W["wo"])
    x = layernorm(x + np.tanh(x @ W["ff1"] + W["b1"]) @ W["ff2"] + W["b2"])
    logits = x[:, 0, :] @ W["head_w"] + W["head_b"]
    return 1.0 / (1.0 + np.exp(-logits))


def transformer_score_pairs(
    pairs: DataFrame, query_id: str, doc_id: str, query_text: str, doc_text: str
) -> DataFrame:
    """Arrow-batched transformer scoring: one forward pass per record
    batch, vectorized across the batch (the torch/onnx deployment shape)."""
    schema = f"{query_id} bigint, {doc_id} bigint, score double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            toks = [_token_ids(q, d)
                    for q, d in zip(pdf[query_text], pdf[doc_text])]
            scores = _forward([t[0] for t in toks], [t[1] for t in toks])
            yield pd.DataFrame(
                {query_id: pdf[query_id], doc_id: pdf[doc_id],
                 "score": np.round(scores, 9)}
            )

    return pairs.select(query_id, doc_id, query_text, doc_text).mapInPandas(
        batches, schema
    )


def transformer_rerank(
    pairs: DataFrame,
    query_id: str,
    doc_id: str,
    query_text: str,
    doc_text: str,
    k: int = 3,
) -> DataFrame:
    """Real-model cross-encoder rerank: transformer scores + per-query
    top-k, ties broken on doc id ascending (deterministic)."""
    scored = transformer_score_pairs(pairs, query_id, doc_id, query_text, doc_text)
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(doc_id))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, doc_id, "score", F.col("rk").cast("int").alias("rk"))
    )


# --- integer fixed-point cross-encoder (round-11: the oracle-checkable model) --
#
# Same architecture family as the float transformer above (hashed-vocab +
# positional + segment embeddings over [CLS] query [SEP] doc, multi-head
# attention from the CLS query, residual + layernorm, FFN, residual +
# layernorm, linear head) but every operation is EXACT int64 arithmetic
# with committed conventions, so a DuckDB oracle can reproduce the scores
# bit-for-bit (the float model's softmax/exp chain cannot be):
# - weights are md5-derived small integers (w = md5int6(name:i:j) % 15 - 7)
#   — derivable in SQL, no literal blobs;
# - attention softmax -> rational min-shifted weights a_j = s_j - min(s),
#   ctx = tdiv(sum a_j * v_j, sum a_j + 1);
# - layernorm -> integer centering (D*x - sum) scaled by 128 over
#   (exact integer sqrt of sum of squares) + 1;
# - activation tanh -> integer softsign tdiv(256*z, 256 + |z|);
# - tdiv = truncate-toward-zero division (sign(x) * (|x| // y), y > 0) —
#   identical in numpy, python and both SQL engines for nonneg operands.
# Single layer, head reads the CLS position only, so only the CLS row's
# query projection is computed (keys/values over the full sequence).

XD, XH, XE, XFF, XL, XV = 8, 2, 4, 16, 12, 32  # dims, heads, dk, ffn, seq, vocab


def _mdint6(s: str) -> int:
    """First 6 hex chars of md5 as an int — the shared weight/vocab hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _xw_matrix(name: str, rows: int, cols: int) -> np.ndarray:
    return np.array(
        [
            [_mdint6(f"xw:{name}:{i}:{j}") % 15 - 7 for j in range(cols)]
            for i in range(rows)
        ],
        dtype=np.int64,
    )


_XW_INT = {
    "emb": _xw_matrix("emb", XV, XD),
    "pos": _xw_matrix("pos", XL, XD),
    "seg": _xw_matrix("seg", 3, XD),
    "wq": _xw_matrix("wq", XD, XH * XE),
    "wk": _xw_matrix("wk", XD, XH * XE),
    "wv": _xw_matrix("wv", XD, XH * XE),
    "wo": _xw_matrix("wo", XH * XE, XD),
    "ff1": _xw_matrix("ff1", XD, XFF),
    "ff2": _xw_matrix("ff2", XFF, XD),
    "head": _xw_matrix("head", 1, XD)[0],
}


def _int_tokenize(query_text: str, doc_text: str) -> tuple[list[int], list[int]]:
    """[CLS] q… [SEP] d… (ids, segs) truncated to XL. Tokens split on
    ' +' after trim — EXACTLY the SQL string_split_regex semantics (an
    all-whitespace text yields one empty token, not zero)."""
    import re

    def toks(s: str) -> list[str]:
        return re.split(" +", s.strip())

    ids, segs = [0], [0]
    for t in toks(query_text):
        ids.append(2 + _mdint6("xt:" + t) % (XV - 2))
        segs.append(1)
    ids.append(1)
    segs.append(1)
    for t in toks(doc_text):
        ids.append(2 + _mdint6("xt:" + t) % (XV - 2))
        segs.append(2)
    return ids[:XL], segs[:XL]


def _tdiv(x: np.ndarray, y) -> np.ndarray:
    """Truncate-toward-zero integer division, y > 0 (elementwise)."""
    return np.sign(x) * (np.abs(x) // y)


def _visqrt(n: np.ndarray) -> np.ndarray:
    """Exact integer sqrt via float floor + integer correction — the same
    two-step the SQL oracle runs, so both are exact for any int64 input
    in range (float sqrt is correctly rounded; the correction absorbs the
    at-most-1 floor error near perfect squares)."""
    r = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    r = r + ((r + 1) * (r + 1) <= n).astype(np.int64) - (r * r > n).astype(np.int64)
    return r


def _int_layernorm(x: np.ndarray) -> np.ndarray:
    """(B, D) int64 -> (B, D) int64: c = D*x - sum; 128*c over isqrt(sum c^2)+1."""
    c = XD * x - x.sum(axis=1, keepdims=True)
    root = _visqrt((c * c).sum(axis=1, keepdims=True)) + 1
    return _tdiv(128 * c, root)


def _int_forward(ids_batch: list[list[int]], segs_batch: list[list[int]]) -> np.ndarray:
    """Batched integer forward pass -> int64 logits (one per pair)."""
    W = _XW_INT
    B = len(ids_batch)
    ids = np.zeros((B, XL), dtype=np.int64)
    segs = np.zeros((B, XL), dtype=np.int64)
    mask = np.zeros((B, XL), dtype=bool)
    for i, (a, g) in enumerate(zip(ids_batch, segs_batch)):
        ids[i, : len(a)] = a
        segs[i, : len(a)] = g
        mask[i, : len(a)] = True
    x = (W["emb"][ids] + W["pos"][None, :, :] + W["seg"][segs]) * mask[:, :, None]
    q0 = (x[:, 0, :] @ W["wq"]).reshape(B, XH, XE)
    K = (x @ W["wk"]).reshape(B, XL, XH, XE)
    V = (x @ W["wv"]).reshape(B, XL, XH, XE)
    s = np.einsum("bhe,bjhe->bhj", q0, K)  # int64 exact
    big = np.iinfo(np.int64).max
    smin = np.where(mask[:, None, :], s, big).min(axis=2, keepdims=True)
    a = np.where(mask[:, None, :], s - smin, 0)
    den = a.sum(axis=2, keepdims=True) + 1
    num = np.einsum("bhj,bjhe->bhe", a, V)
    ctx = _tdiv(num, den).reshape(B, XH * XE)
    r1 = x[:, 0, :] + _tdiv(ctx @ W["wo"], 1024)
    y = _int_layernorm(r1)
    z1 = y @ W["ff1"]
    h1 = _tdiv(256 * z1, 256 + np.abs(z1))
    r2 = y + _tdiv(h1 @ W["ff2"], 256)
    z = _int_layernorm(r2)
    return z @ W["head"]


def int_transformer_rerank(
    pairs: DataFrame,
    query_id: str,
    doc_id: str,
    query_text: str,
    doc_text: str,
    k: int = 3,
) -> DataFrame:
    """Integer cross-encoder rerank: Arrow-batched int64 forward pass +
    per-query top-k (logit desc, doc id asc). Scores are exact integers,
    so the whole pipeline — tokenizer, weights, attention, layernorms,
    head, ranking — hash-matches the relational DuckDB oracle
    (q_transformer_rerank) and the pure-python pin."""
    schema = f"{query_id} bigint, {doc_id} bigint, logit bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            toks = [
                _int_tokenize(q, d)
                for q, d in zip(pdf[query_text], pdf[doc_text])
            ]
            logits = _int_forward([t[0] for t in toks], [t[1] for t in toks])
            yield pd.DataFrame(
                {query_id: pdf[query_id], doc_id: pdf[doc_id], "logit": logits}
            )

    scored = pairs.select(query_id, doc_id, query_text, doc_text).mapInPandas(
        batches, schema
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("logit"), F.asc(doc_id))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, doc_id, "logit", F.col("rk").cast("int").alias("rk"))
    )
