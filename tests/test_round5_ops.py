"""Round-5 analytics/pipeline operators: Markov transitions, Brown's
double exponential smoothing, SAX, multi-pattern blocklist, grid-density
clustering — each pinned against a plain-Python model."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from platform_etl_backend_spark.catalog import QUERIES
from tests.conftest import load


def test_markov_transitions_match_python(spark, sf_dir):
    got = {
        (r.prev_type, r.next_type): (r.c_ab, r.c_a, r.p_micro)
        for r in QUERIES["q_markov_transitions"].fn(spark, sf_dir).collect()
    }
    from platform_etl_backend_spark.catalog.events import events_table

    rows = (
        events_table(spark, sf_dir)
        .select("user_id", "ep", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ep, r.event_id, r.event_type))
    c_ab: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
    c_a: dict[str, int] = {}
    for (a, _), c in c_ab.items():
        c_a[a] = c_a.get(a, 0) + c
    want = {
        (a, b): (c, c_a[a], (1_000_000 * c) // c_a[a]) for (a, b), c in c_ab.items()
    }
    assert got == want
    # rows of the matrix sum to ~1e6 (floor rounding loses < n_types)
    for a in c_a:
        total = sum(p for (x, _), (_, _, p) in got.items() if x == a)
        assert 1_000_000 - len(c_a) <= total <= 1_000_000


def test_double_exp_smoothing_matches_python(spark):
    df = spark.createDataFrame(
        [(i, 1, float(v)) for i, v in enumerate([10, 12, 15, 13, 18, 21, 19, 25])],
        ["event_id", "user_id", "value"],
    ).withColumn("ep", F.col("event_id").cast("bigint"))
    # rebuild the query's internals on the toy frame via the same code path
    import platform_etl_backend_spark.catalog.events as mod

    orig = mod.events_table
    mod.events_table = lambda spark_, sf_: df
    try:
        got = {
            r.event_id: (r.level, r.trend, r.forecast_1)
            for r in QUERIES["q_double_exp_smoothing"].fn(spark, "unused").collect()
        }
    finally:
        mod.events_table = orig
    a = 0.2
    xs = [10.0, 12.0, 15.0, 13.0, 18.0, 21.0, 19.0, 25.0]
    s1 = []
    for i, x in enumerate(xs):
        s1.append(x if i == 0 else s1[-1] * (1 - a) + x * a)
    s2 = []
    for i, s in enumerate(s1):
        s2.append(s if i == 0 else s2[-1] * (1 - a) + s * a)
    for i in range(len(xs)):
        lv, tr = 2 * s1[i] - s2[i], (a / (1 - a)) * (s1[i] - s2[i])
        assert got[i] == (round(lv, 6), round(tr, 6), round(lv + tr, 6)), i


def test_sax_symbols_match_python(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    rows = events_table(spark, sf_dir).select(
        "user_id", "ep", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ep, r.event_id, r.value))
    want = {}
    for u, seq in by_user.items():
        seq.sort()
        vals = [v for _, _, v in seq]
        n = len(vals)
        mean = sum(vals) / n  # tolerance-compared below, exactness via the oracle
        var = sum(v * v for v in vals) / n - mean * mean
        segs: dict[int, list] = {}
        for i, v in enumerate(vals):
            segs.setdefault((i * 4) // n, []).append(v)
        word = ""
        for s in sorted(segs):
            if var <= 0:
                word += "_"
                continue
            z = (sum(segs[s]) / len(segs[s]) - mean) / var**0.5
            word += "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        want[u] = (n, word)
    got = {
        r.user_id: (r.n, r.sax)
        for r in QUERIES["q_sax_symbols"].fn(spark, sf_dir).collect()
    }
    # symbols are robust to the python-float vs decimal-sum difference
    # unless a z-value sits within ~1e-9 of a breakpoint (not the case in
    # this data); the ORACLE pins the exact arithmetic
    assert got == want


def test_multi_pattern_match_plants_and_plan(spark, sf_dir):
    from platform_etl_backend_spark.plans import explain_str

    df = QUERIES["q_multi_pattern_match"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    # pure scan -> project -> filter (+ the output sort): no joins, no
    # aggregations — the single-pass multi-pattern claim
    assert "Join" not in plan and "Aggregate" not in plan
    rows = {r.doc_id: (r.n_matched, r.matched) for r in df.collect()}
    docs = {r["doc_id"]: r["text"] for r in load(spark, sf_dir, "documents").collect()}
    pats = ("join", "merge", "quantum", "stream", "window", "xylophone")
    for doc_id, text in docs.items():
        toks = set(text.split())
        hits = sorted(p for p in pats if p in toks)
        if hits:
            assert rows[doc_id] == (len(hits), "|".join(hits)), doc_id
        else:
            assert doc_id not in rows
    assert all("quantum" not in m for _, m in rows.values())  # absent pattern


def test_grid_cluster_matches_python_bfs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").collect()
    import math

    cells: dict[tuple[int, int], int] = {}
    for r in emb:
        cx = math.floor(float(r.embedding[0]) / 0.05)
        cy = math.floor(float(r.embedding[1]) / 0.05)
        cells[(cx, cy)] = cells.get((cx, cy), 0) + 1
    dense = {c: n for c, n in cells.items() if n >= 3}
    seen: set[tuple[int, int]] = set()
    want = {}
    for start in dense:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            c = stack.pop()
            comp.append(c)
            for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (c[0] + d[0], c[1] + d[1])
                if nb in dense and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        label = min((cx + 100) * 1000 + (cy + 100) for cx, cy in comp)
        want[label] = (len(comp), sum(dense[c] for c in comp))
    got = {
        r.cluster: (r.n_cells, r.n_points)
        for r in QUERIES["q_grid_cluster"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # the singleton-cluster path (isolated dense cell) must be present in
    # this data — it is what the left-join+coalesce exists for
    assert any(nc == 1 for nc, _ in want.values())


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_dsir_weights_favor_target_domain(spark, sf_dir):
    """DSIR sanity: the importance weights must be a real domain signal —
    target-domain docs (src0-3) should be over-represented in the top-100
    resample relative to their 20% base rate; and the weights must match
    a plain-Python model of the same Laplace-smoothed hashed-bigram-free
    bag-of-words ratio within float tolerance."""
    import hashlib
    import math

    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in load(spark, sf_dir, "documents").collect()
    }

    def bucket_counts(text: str) -> dict[int, int]:
        out: dict[int, int] = {}
        for t in text.split():
            if not t:
                continue
            h = hashlib.md5(("fh:" + t).encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            out[b] = out.get(b, 0) + 1
        return out

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc = {}
    for doc_id, (src, text) in docs.items():
        bc = bucket_counts(text)
        per_doc[doc_id] = bc
        for b, c in bc.items():
            raw[b] = raw.get(b, 0) + c
            if src in ("src0", "src1", "src2", "src3"):
                tgt[b] = tgt.get(b, 0) + c
    tr, tt = sum(raw.values()), sum(tgt.values())
    lnr = {
        b: math.log((tgt.get(b, 0) + 1) * (tr + 64)) - math.log((raw[b] + 1) * (tt + 64))
        for b in raw
    }
    want = {
        d: sum(c * lnr[b] for b, c in bc.items()) for d, bc in per_doc.items()
    }
    top = sorted(want, key=lambda d: (-want[d], d))[:100]
    got = {r.doc_id: (r.logw, r.rank) for r in QUERIES["q_dsir_weights"].fn(spark, sf_dir).collect()}
    assert set(got) == set(top)
    for d in got:
        assert abs(got[d][0] - want[d]) < 1e-4, d
    target_share = sum(1 for d in got if docs[d][0] in ("src0", "src1", "src2", "src3")) / 100
    assert target_share > 0.3  # > 20% base rate: the signal is real


def test_pca_power_matches_numpy_eig(spark, sf_dir):
    import numpy as np

    emb = np.array([list(r.embedding) for r in load(spark, sf_dir, "embeddings").collect()], dtype=np.float64)
    q = np.floor(emb * 1e6)
    n = q.shape[0]
    cov = (q.T @ q / n - np.outer(q.mean(axis=0), q.mean(axis=0))) / 1e12
    cov = np.round(cov, 9)
    vals, vecs = np.linalg.eigh(cov)
    top_val = vals[-1]
    # numpy twin of the SAME 20 bounded power iterations (the query's
    # contract is the iteration, not the limit — random embeddings give a
    # near-isotropic spectrum where exact convergence is slow)
    from platform_etl_backend_spark.catalog.vectors import _PCA_ITERS

    v = np.full(64, 0.125)
    for _ in range(_PCA_ITERS):
        u = cov @ v
        nrm = float(np.sqrt(np.sum(u * u)))
        v = u / nrm
    got = QUERIES["q_pca_power"].fn(spark, sf_dir).collect()
    loadings = np.array([r.loading for r in sorted(got, key=lambda r: r.i)])
    eigval = got[0].eigval
    assert float(np.abs(loadings - v).max()) < 1e-4  # decimal-vs-float drift only
    assert abs(eigval - nrm) < 1e-6
    assert abs(eigval - top_val) < 0.05 * abs(top_val)  # converging to the top
    assert abs(float(np.linalg.norm(loadings)) - 1.0) < 1e-4
