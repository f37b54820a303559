#!/usr/bin/env python
"""Offline trainer for the committed linear quality-classifier weights.

The model-based quality filter (fastText/DSIR-style: a linear classifier
over cheap hashed bag-of-words features, the standard companion to the
heuristic Gopher/C4 rules) needs a weight vector. This script trains it
ONCE, offline, and the resulting weights are committed as integer
micro-unit literals in ``operators/textqa.py`` (QUALITY_WEIGHTS_MICRO /
QUALITY_BIAS_MICRO) so that scoring is pure, engine-portable integer
arithmetic — the catalog query and its DuckDB oracle share the literals.

Training setup (documented so the committed vector is reproducible):
- corpus: /root/testdata/sf0.001/documents.parquet (fixed driver testdata)
- features: the SAME 64-dim signed hashing-trick vectorizer as
  ``hashed_features`` (md5 bucket + sign nibble), replicated here in
  plain Python
- label: 1 ("keep") when the doc's distinct-token ratio is >= the corpus
  median — i.e. the classifier learns to flag repetition-heavy docs from
  bag-of-words evidence alone, a realistic quality-filter target
- optimizer: full-batch gradient descent on logistic loss + L2, fixed
  seed-free deterministic init (zeros), 300 steps, lr 0.5, lambda 1e-3
- export: w * 1e6 rounded to int (micro-units); features are small
  integer counts so logits stay well inside BIGINT

Run: python scripts/train_quality_weights.py
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

WIDTH = 64


def hashed_vector(text: str) -> np.ndarray:
    v = np.zeros(WIDTH, dtype=np.float64)
    for tok in text.split():
        if not tok:
            continue
        h = hashlib.md5(("fh:" + tok).encode()).hexdigest()
        bucket = (int(h[0], 16) * 16 + int(h[1], 16)) % WIDTH
        sign = 1.0 if int(h[2], 16) < 8 else -1.0
        v[bucket] += sign
    return v


def main() -> None:
    rows = duckdb.sql(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    X = np.stack([hashed_vector(t) for _, t in rows])
    ratios = np.array(
        [len(set(t.split())) / max(len(t.split()), 1) for _, t in rows]
    )
    y = (ratios >= np.median(ratios)).astype(np.float64)

    w = np.zeros(WIDTH)
    b = 0.0
    lr, lam = 0.5, 1e-3
    n = len(y)
    for _ in range(300):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) / n
        w -= lr * (X.T @ g + lam * w)
        b -= lr * g.sum()

    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p >= 0.5) == (y == 1.0)).mean()
    wm = [int(round(x * 1_000_000)) for x in w]
    bm = int(round(b * 1_000_000))
    print(f"# train acc {acc:.3f} on n={n} (label base rate {y.mean():.3f})")
    print(f"QUALITY_BIAS_MICRO = {bm}")
    print("QUALITY_WEIGHTS_MICRO = (")
    for i in range(0, WIDTH, 8):
        print("    " + ", ".join(str(x) for x in wm[i : i + 8]) + ",")
    print(")")


if __name__ == "__main__":
    main()
