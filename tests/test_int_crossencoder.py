"""Integer fixed-point cross-encoder (operators/rerank.py, round 11):
the pure-python pin.

The DuckDB oracle (catalog/multimodal.py q_transformer_rerank) pins the
numpy kernel through the driver gate; this module pins it AGAIN against
an independent pure-python implementation (hashlib + math.isqrt + int
loops, no numpy) — the shared-fragment lesson: a single generated
computation is a single point of failure, so every such kernel needs a
model written from the spec, not from the code.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np

from platform_etl_backend_spark.operators.rerank import (
    XD, XE, XFF, XH, XL, XV,
    _int_forward,
    _int_tokenize,
    _tdiv,
    _visqrt,
)


def _md6(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _w(name: str, i: int, j: int) -> int:
    return _md6(f"xw:{name}:{i}:{j}") % 15 - 7


def _pydiv(x: int, y: int) -> int:
    return (abs(x) // y) * (1 if x >= 0 else -1)


def _pyln(x: list[int]) -> list[int]:
    s = sum(x)
    c = [XD * v - s for v in x]
    root = math.isqrt(sum(v * v for v in c)) + 1
    return [_pydiv(128 * v, root) for v in c]


def _py_int_forward(ids: list[int], segs: list[int]) -> int:
    """From-spec pure-python forward (no numpy)."""
    L = len(ids)
    x = [
        [
            _w("emb", ids[p], d) + _w("pos", p, d) + _w("seg", segs[p], d)
            for d in range(XD)
        ]
        for p in range(L)
    ]
    q0 = [sum(x[0][d] * _w("wq", d, he) for d in range(XD)) for he in range(XH * XE)]
    K = [
        [sum(x[p][d] * _w("wk", d, he) for d in range(XD)) for he in range(XH * XE)]
        for p in range(L)
    ]
    V = [
        [sum(x[p][d] * _w("wv", d, he) for d in range(XD)) for he in range(XH * XE)]
        for p in range(L)
    ]
    ctx = [0] * (XH * XE)
    for h in range(XH):
        s = [
            sum(q0[h * XE + e] * K[j][h * XE + e] for e in range(XE))
            for j in range(L)
        ]
        m = min(s)
        a = [v - m for v in s]
        den = sum(a) + 1
        for e in range(XE):
            num = sum(a[j] * V[j][h * XE + e] for j in range(L))
            ctx[h * XE + e] = _pydiv(num, den)
    o = [sum(ctx[he] * _w("wo", he, d) for he in range(XH * XE)) for d in range(XD)]
    r1 = [x[0][d] + _pydiv(o[d], 1024) for d in range(XD)]
    y = _pyln(r1)
    z1 = [sum(y[d] * _w("ff1", d, f) for d in range(XD)) for f in range(XFF)]
    h1 = [_pydiv(256 * z, 256 + abs(z)) for z in z1]
    o2 = [sum(h1[f] * _w("ff2", f, d) for f in range(XFF)) for d in range(XD)]
    r2 = [y[d] + _pydiv(o2[d], 256) for d in range(XD)]
    z = _pyln(r2)
    return sum(z[d] * _w("head", 0, d) for d in range(XD))


SAMPLES = [
    ("alpha beta gamma", "delta epsilon zeta eta theta"),
    ("one", "two"),
    ("a b c d e f g h i j k l m n o p", "q r s t u v w"),  # truncation
    ("", ""),  # all-whitespace: SQL split semantics — one empty token
    ("repeated repeated repeated", "repeated repeated"),
    ("The quick brown fox", "jumps over the lazy dog"),
]


def test_int_forward_matches_pure_python_model():
    toks = [_int_tokenize(q, d) for q, d in SAMPLES]
    got = _int_forward([t[0] for t in toks], [t[1] for t in toks])
    for (ids, segs), g in zip(toks, got):
        assert int(g) == _py_int_forward(ids, segs)


def test_int_tokenize_sql_split_semantics():
    ids, segs = _int_tokenize("", "x")
    # [CLS] + one EMPTY query token (string_split_regex('', ' +') = [''])
    # + [SEP] + doc token
    assert len(ids) == 4 and ids[0] == 0 and ids[2] == 1
    assert segs == [0, 1, 1, 2]
    assert ids[1] == 2 + _md6("xt:") % (XV - 2)
    long_q = " ".join(str(i) for i in range(30))
    ids2, segs2 = _int_tokenize(long_q, "tail")
    assert len(ids2) == XL and len(segs2) == XL  # truncation


def test_tdiv_and_isqrt_conventions():
    # truncate toward zero — NOT floor — for negative numerators
    assert _tdiv(np.array([-7]), 2)[0] == -3
    assert _tdiv(np.array([7]), 2)[0] == 3
    assert _pydiv(-7, 2) == -3
    # exact integer sqrt incl. perfect squares and their neighbors
    vals = np.array([0, 1, 2, 3, 4, 8, 9, 10, 10**12, 10**12 + 1,
                     (10**6) ** 2 - 1])
    want = np.array([math.isqrt(int(v)) for v in vals])
    assert (_visqrt(vals) == want).all()


def test_int_scores_discriminate():
    toks = [_int_tokenize(q, d) for q, d in SAMPLES]
    got = _int_forward([t[0] for t in toks], [t[1] for t in toks])
    assert len(set(int(g) for g in got)) > 1


def test_tokenize_matches_regex_split():
    # the kernel's tokenization is the SQL semantics by construction
    text = "  a   b c  "
    assert re.split(" +", text.strip()) == ["a", "b", "c"]
    ids, _ = _int_tokenize(text, "z")
    assert len(ids) == 1 + 3 + 1 + 1
