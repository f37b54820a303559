"""Round-7 operator pins: FW-BW pivot SCC and friends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _scc_map(df):
    return {r["node"]: r["scc"] for r in df.collect()}


def test_fwbw_scc_equals_exact_scc_on_events_graph(spark, sf_dir):
    """The FW-BW coloring must produce EXACTLY the closure-based labels
    on the 50-node catalog graph (same min-member convention)."""
    from platform_etl_backend_spark.catalog import QUERIES

    exact = _scc_map(QUERIES["q_scc"].fn(spark, sf_dir))
    fwbw = _scc_map(QUERIES["q_scc_fwbw"].fn(spark, sf_dir))
    assert fwbw == exact


def test_fwbw_scc_matches_networkx_on_random_digraph(spark):
    import random

    nx = pytest.importorskip("networkx")
    from platform_etl_backend_spark.operators.graph import fwbw_scc

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    g = nx.DiGraph(edges)
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for node in comp:
            want[node] = m
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _scc_map(fwbw_scc(df))
    assert got == want


def test_fwbw_scc_trims_acyclic_graph_in_one_round(spark):
    """A DAG is all singleton SCCs — trim must peel everything without
    ever needing a pivot BFS beyond round 1."""
    from platform_etl_backend_spark.operators.graph import fwbw_scc

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    got = _scc_map(fwbw_scc(df, max_rounds=2))
    assert got == {i: i for i in range(31)}


def test_fwbw_scc_raises_on_exhausted_budget(spark):
    from platform_etl_backend_spark.operators.graph import fwbw_scc

    # a 6-cycle needs BFS depth > 1; bfs_max=1 must raise, not mislabel
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc, ["src", "dst"])
    with pytest.raises(RuntimeError, match="BFS budget"):
        fwbw_scc(df, bfs_max=1).collect()


# --- weighted MinHash --------------------------------------------------------


def _py_wshingles(text: str, k: int = 3) -> dict[str, int]:
    toks = text.strip().split()
    grams = (
        [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k else [" ".join(toks)]
    )
    tf: dict[str, int] = {}
    for g in grams:
        tf[g] = tf.get(g, 0) + 1
    return tf


def _py_wminhash(tf: dict[str, int], seed: int) -> str:
    import hashlib

    return min(
        hashlib.md5(f"{seed}:{g}:{i}".encode()).hexdigest()
        for g, w in tf.items()
        for i in range(1, w + 1)
    )


def test_weighted_shingle_tf_matches_python(spark):
    from platform_etl_backend_spark.operators.dedup import weighted_shingle_tf

    rows = [(1, "a b c a b c a b"), (2, "x y"), (3, "p q r s p q r")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: {p["g"]: p["w"] for p in r["wsh"]}
        for r in weighted_shingle_tf(df, "doc_id", "text", 3).collect()
    }
    want = {i: _py_wshingles(t) for i, t in rows}
    assert got == want


def test_weighted_minhash_signature_matches_python_replica_min(spark):
    """The Spark signature must equal the md5-min over the python replica
    expansion — the EXACT integer-weight consistent-sampling identity."""
    from platform_etl_backend_spark.operators.dedup import (
        weighted_minhash_signatures,
    )

    rows = [(1, "a b c a b c a b"), (2, "a b c d e f a b c"), (3, "z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["h0"], r["h1"], r["h2"])
        for r in weighted_minhash_signatures(df, "doc_id", "text", 3, 3).collect()
    }
    want = {
        i: tuple(_py_wminhash(_py_wshingles(t), s) for s in range(3))
        for i, t in rows
    }
    assert got == want


def test_weighted_minhash_collision_rate_tracks_weighted_jaccard(spark):
    """Collision probability == weighted Jaccard (the CWS contract):
    over 64 independent hashes the match fraction must track Jw."""
    from platform_etl_backend_spark.operators.dedup import (
        weighted_minhash_signatures,
    )

    a = "the cat sat on the mat " * 4
    b = "the cat sat on the mat " * 2 + "a dog ran in the park " * 2
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    H = 64
    sig = {
        r["doc_id"]: [r[f"h{i}"] for i in range(H)]
        for r in weighted_minhash_signatures(df, "doc_id", "text", 3, H).collect()
    }
    rate = sum(x == y for x, y in zip(sig[1], sig[2])) / H
    ta, tb = _py_wshingles(a), _py_wshingles(b)
    keys = set(ta) | set(tb)
    m = sum(min(ta.get(g, 0), tb.get(g, 0)) for g in keys)
    u = sum(max(ta.get(g, 0), tb.get(g, 0)) for g in keys)
    jw = m / u
    assert abs(rate - jw) < 0.2  # 64 Bernoulli trials; ±3σ ≈ 0.19


# --- numpy transformer cross-encoder ----------------------------------------


def _py_forward_single(ids, segs):
    """Independent PURE-PYTHON (math + list loops, no numpy) forward pass
    of the exact architecture in operators/rerank.py — the model pin."""
    import math

    from platform_etl_backend_spark.operators.rerank import (
        _D, _EPS, _FF, _H, _W,
    )

    W = {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in _W.items()}
    L = len(ids)
    x = [
        [W["emb"][t][j] + W["pos"][i][j] + W["seg"][g][j] for j in range(_D)]
        for i, (t, g) in enumerate(zip(ids, segs))
    ]

    def matvec_rows(xs, M):  # xs: L x D, M: D x K -> L x K
        K = len(M[0])
        return [
            [sum(row[d] * M[d][k] for d in range(len(row))) for k in range(K)]
            for row in xs
        ]

    def layernorm(rows):
        out = []
        for r in rows:
            mu = sum(r) / len(r)
            var = sum((v - mu) ** 2 for v in r) / len(r)
            sd = math.sqrt(var + _EPS)
            out.append([(v - mu) / sd for v in r])
        return out

    dk = _D // _H
    q = matvec_rows(x, W["wq"])
    k_ = matvec_rows(x, W["wk"])
    v = matvec_rows(x, W["wv"])
    ctx = [[0.0] * _D for _ in range(L)]
    for h in range(_H):
        sl = slice(h * dk, (h + 1) * dk)
        for i in range(L):
            scores = [
                sum(a * b for a, b in zip(q[i][sl], k_[j][sl])) / math.sqrt(dk)
                for j in range(L)
            ]
            mx = max(scores)
            es = [math.exp(s - mx) for s in scores]
            z = sum(es)
            probs = [e / z for e in es]
            for d in range(dk):
                ctx[i][h * dk + d] = sum(
                    probs[j] * v[j][h * dk + d] for j in range(L)
                )
    attn_out = matvec_rows(ctx, W["wo"])
    x = layernorm([[a + b for a, b in zip(r1, r2)] for r1, r2 in zip(x, attn_out)])
    ff = matvec_rows(x, W["ff1"])
    ff = [[math.tanh(v_ + W["b1"][j]) for j, v_ in enumerate(r)] for r in ff]
    ff2 = matvec_rows(ff, W["ff2"])
    ff2 = [[v_ + W["b2"][j] for j, v_ in enumerate(r)] for r in ff2]
    x = layernorm([[a + b for a, b in zip(r1, r2)] for r1, r2 in zip(x, ff2)])
    logit = sum(a * b for a, b in zip(x[0], W["head_w"])) + W["head_b"]
    return 1.0 / (1.0 + math.exp(-logit))


def test_transformer_forward_matches_pure_python_model():
    from platform_etl_backend_spark.operators.rerank import _forward, _token_ids

    cases = [
        ("the quick brown fox", "jumps over the lazy dog"),
        ("hello", "a much longer document about many different things here"),
        ("x", "y"),
    ]
    toks = [_token_ids(q, d) for q, d in cases]
    got = _forward([t[0] for t in toks], [t[1] for t in toks])
    for i, (ids, segs) in enumerate(toks):
        want = _py_forward_single(ids, segs)
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_transformer_scores_discriminate_and_are_deterministic():
    """Same pair twice -> identical bits; different pairs -> different
    scores (the head is not constant)."""
    from platform_etl_backend_spark.operators.rerank import _forward, _token_ids

    a = _token_ids("alpha beta", "gamma delta epsilon")
    b = _token_ids("alpha beta", "totally different words entirely")
    s1 = _forward([a[0], b[0]], [a[1], b[1]])
    s2 = _forward([a[0], b[0]], [a[1], b[1]])
    assert s1.tolist() == s2.tolist()
    assert s1[0] != s1[1]
    assert 0.0 < s1[0] < 1.0 and 0.0 < s1[1] < 1.0


def test_transformer_rerank_spark_topk(spark, sf_dir):
    """End-to-end through mapInPandas: batch scores must equal the local
    forward pass, and the per-query top-3 window must rank by them."""
    from platform_etl_backend_spark.catalog import QUERIES
    from platform_etl_backend_spark.operators.rerank import _forward, _token_ids

    out = QUERIES["q_transformer_rerank"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    import numpy as np

    for r in rows[:10]:
        ids, segs = _token_ids(docs[r["query_id"]], docs[r["doc_id"]])
        want = float(np.round(_forward([ids], [segs]), 9)[0])
        assert r["score"] == want
    # ranks ordered by score desc within query
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append((r["rk"], r["score"], r["doc_id"]))
    for q_, lst in per_q.items():
        lst.sort()
        assert len(lst) <= 3
        scores = [s for _, s, _ in lst]
        assert scores == sorted(scores, reverse=True)


# --- distributed logistic-regression GD --------------------------------------


def test_logreg_gd_matches_python_model(spark, sf_dir):
    """3-step Elliott-sigmoid full-batch GD pinned against a plain-python
    model over the same rows (same 9 d.p. gradient rounding, same update
    order), and the learned classifier must beat the majority class."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_logreg_gd"].fn(spark, sf_dir).collect()[0]
    rows = [
        (r["x1"], r["x2"], r["y"])
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            " / CAST(10000000.0 AS DOUBLE) AS x1",
            "CAST(MONTH(o_orderdate) AS BIGINT) / CAST(12.0 AS DOUBLE) AS x2",
            "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y",
        ).collect()
    ]
    n = len(rows)
    w = [0.0, 0.0, 0.0]
    for _ in range(3):
        sums = [0.0, 0.0, 0.0]
        for x1, x2, y in rows:
            z = w[0] + w[1] * x1 + w[2] * x2
            sig = 0.5 + 0.5 * z / (1 + abs(z))
            sums[0] += round(sig - y, 9)
            sums[1] += round((sig - y) * x1, 9)
            sums[2] += round((sig - y) * x2, 9)
        w = [w[j] - 2.0 * (sums[j] / n) for j in range(3)]
    assert abs(got["w_bias"] - w[0]) < 1e-12
    assert abs(got["w_price"] - w[1]) < 1e-12
    assert abs(got["w_month"] - w[2]) < 1e-12
    correct = sum(
        1 for x1, x2, y in rows
        if ((w[0] + w[1] * x1 + w[2] * x2) > 0) == (y == 1)
    )
    assert got["n_correct"] == correct and got["n"] == n
    majority = max(sum(y for *_, y in rows), n - sum(y for *_, y in rows))
    assert correct > majority  # it actually learned


# --- negative sampling / kappa / conformal ------------------------------------


def test_negative_sampling_matches_python_model(spark, sf_dir):
    """Unigram^0.75 table pinned against plain python: identical weights
    (sqrt∘sqrt∘cube — IEEE-exact), identical seeded draws, identical
    bucket assignment."""
    import hashlib
    import math
    from collections import Counter

    from platform_etl_backend_spark.catalog import QUERIES

    got = [
        (r["i"], r["token"], r["cnt"], r["weight_micro"])
        for r in QUERIES["q_negative_sampling"].fn(spark, sf_dir).collect()
    ]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt = Counter(t for r in docs for t in r["text"].strip().split())
    vocab = sorted(cnt)
    w = {t: int(math.floor(math.sqrt(math.sqrt(float(c * c * c))) * 1000000))
         for t, c in cnt.items()}
    cum, acc = [], 0
    for t in vocab:
        acc += w[t]
        cum.append((t, acc))
    total = acc
    want = []
    for i in range(16):
        r = int(hashlib.md5(f"neg:{i}".encode()).hexdigest()[:12], 16) % total
        tok = next(t for t, cw in cum if cw > r)
        want.append((i, tok, cnt[tok], w[tok]))
    assert got == want


def test_negative_sampling_favors_frequent_tokens(spark, sf_dir):
    """The damped-unigram distribution must still favor frequent tokens:
    the mean count of sampled tokens exceeds the vocabulary mean."""
    from collections import Counter

    from platform_etl_backend_spark.catalog import QUERIES

    rows = QUERIES["q_negative_sampling"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt = Counter(t for r in docs for t in r["text"].strip().split())
    vocab_mean = sum(cnt.values()) / len(cnt)
    sample_mean = sum(r["cnt"] for r in rows) / len(rows)
    assert sample_mean > vocab_mean


def test_cohens_kappa_matches_python_model(spark, sf_dir):
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    n = got["n00"] + got["n01"] + got["n10"] + got["n11"]
    assert got["n"] == n
    po = (got["n00"] + got["n11"]) / n
    a0, a1 = got["n00"] + got["n01"], got["n10"] + got["n11"]
    b0, b1 = got["n00"] + got["n10"], got["n01"] + got["n11"]
    pe = (a0 * b0 + a1 * b1) / (n * n)
    kappa = (po - pe) / (1 - pe)
    # micro round-half-away of the float model must match within 1 micro
    assert abs(got["kappa_micro"] - round(kappa * 1e6)) <= 1
    assert abs(got["po_micro"] - round(po * 1e6)) <= 1
    # the trained classifier must agree with the reference beyond chance
    assert got["kappa_micro"] > 200000  # kappa > 0.2


def test_conformal_interval_coverage_and_quantile(spark, sf_dir):
    """qhat must be the exact ceil((n+1)·0.9)-th smallest calibration
    residual (python rank-pick), and held-out coverage ≥ 85% (the 90%
    marginal guarantee minus finite-sample slack)."""
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_conformal_interval"].fn(spark, sf_dir).collect()[0]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    cal = defaultdict(list)
    rows = []
    for r in orders:
        cents = round(float(r["o_totalprice"]) * 100)
        seg = cust[r["o_custkey"]]
        rows.append((r["o_orderkey"], seg, cents, r["o_orderkey"] % 2))
        if r["o_orderkey"] % 2 == 0:
            cal[seg].append(cents)
    pred = {s: (2 * sum(v) + len(v)) // (2 * len(v)) for s, v in cal.items()}
    resid = sorted(
        (abs(c - pred[s]), k) for k, s, c, sp in rows if sp == 0
    )
    n_cal = len(resid)
    k_idx = -(-(n_cal + 1) * 9 // 10)  # ceil
    qhat = resid[k_idx - 1][0]
    assert got["n_cal"] == n_cal and got["qhat_cents"] == qhat
    test = [(abs(c - pred[s]) <= qhat) for k, s, c, sp in rows if sp == 1]
    assert got["n_test"] == len(test)
    assert got["n_covered"] == sum(test)
    assert got["coverage_micro"] >= 850000


# --- drift / survival / boosting -----------------------------------------------


def _event_bins(spark, sf_dir):
    import math
    from collections import defaultdict

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).where("event_type IN ('purchase', 'click')").collect()
    bins = defaultdict(lambda: [0, 0])
    for r in rows:
        b = math.floor(r["value"] / 10)
        bins[b][0 if r["event_type"] == "purchase" else 1] += 1
    return bins


def test_psi_drift_matches_python_model(spark, sf_dir):
    import math

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_psi_drift"].fn(spark, sf_dir).collect()[0]
    bins = _event_bins(spark, sf_dir)
    na = sum(v[0] for v in bins.values())
    nb = sum(v[1] for v in bins.values())
    k = len(bins)
    psi = sum(
        ((ca + 1) / (na + k) - (cb + 1) / (nb + k))
        * math.log(((ca + 1) * (nb + k)) / ((cb + 1) * (na + k)))
        for ca, cb in bins.values()
    )
    assert got["n_a"] == na and got["n_b"] == nb and got["n_bins"] == k
    assert abs(got["psi"] - psi) < 1e-5
    assert got["psi"] >= 0


def test_js_divergence_matches_python_model_and_is_bounded(spark, sf_dir):
    import math

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_js_divergence"].fn(spark, sf_dir).collect()[0]
    bins = _event_bins(spark, sf_dir)
    na = sum(v[0] for v in bins.values())
    nb = sum(v[1] for v in bins.values())
    js = 0.5 * sum(
        (ca / na) * math.log((2 * ca * nb) / (ca * nb + cb * na))
        for ca, cb in bins.values() if ca > 0
    ) + 0.5 * sum(
        (cb / nb) * math.log((2 * cb * na) / (ca * nb + cb * na))
        for ca, cb in bins.values() if cb > 0
    )
    assert abs(got["js_nats"] - js) < 1e-5
    assert 0 <= got["js_nats"] <= math.log(2) + 1e-9


def test_logrank_matches_python_model(spark, sf_dir):
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES
    from platform_etl_backend_spark.catalog.events import events_table

    got = QUERIES["q_logrank_test"].fn(spark, sf_dir).collect()[0]
    ev = events_table(spark, sf_dir).select(
        "user_id", "event_type", "value", "ep"
    ).collect()
    per = defaultdict(lambda: [None, None, None])  # t0, t_conv, t_last
    for r in ev:
        p = per[r["user_id"]]
        p[0] = r["ep"] if p[0] is None else min(p[0], r["ep"])
        p[2] = r["ep"] if p[2] is None else max(p[2], r["ep"])
        if r["event_type"] == "purchase" and r["value"] >= 190.0:
            p[1] = r["ep"] if p[1] is None else min(p[1], r["ep"])
    subjects = [
        (uid % 2, (p[1] - p[0]) if p[1] is not None else (p[2] - p[0]),
         1 if p[1] is not None else 0)
        for uid, p in per.items()
    ]
    times = sorted({d for _, d, e in subjects if e})
    o1 = e1 = var = 0.0
    for t in times:
        at = [(g, d, e) for g, d, e in subjects if d >= t]
        n = len(at)
        if n <= 1:
            continue
        n1 = sum(1 for g, *_ in at if g == 1)
        d_t = sum(e for g, d, e in at if d == t)
        d1 = sum(e for g, d, e in at if d == t and g == 1)
        o1 += d1
        e1 += round(d_t * n1 / n, 9)
        var += round(((d_t * n1) * (n - n1) * (n - d_t)) / ((n * n) * (n - 1)), 9)
    assert got["o1"] == o1
    assert abs(got["e1"] - e1) < 1e-5
    assert abs(got["var1"] - var) < 1e-5
    assert abs(got["chi2"] - (o1 - got["e1"]) ** 2 / got["var1"]) < 1e-5


def test_boosted_stumps_matches_python_and_reduces_sse(spark, sf_dir):
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_boosted_stumps"].fn(spark, sf_dir).collect()[0]
    rows = [
        (int(r["q"]), int(r["disc"]), int(r["y"]))
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS disc",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
        ).collect()
    ]

    def fit(pairs):
        agg = defaultdict(lambda: [0, 0])
        for x, y in pairs:
            agg[x][0] += 1
            agg[x][1] += y
        xs = sorted(agg)
        nt = sum(v[0] for v in agg.values())
        st = sum(v[1] for v in agg.values())
        best = None
        nl = sl = 0
        for x in xs:
            nl += agg[x][0]
            sl += agg[x][1]
            if nt - nl == 0:
                continue
            score = (sl * sl) / nl + ((st - sl) * (st - sl)) / (nt - nl)
            if best is None or score > best[0]:
                best = (score, x, nl, sl)
        _, thr, nl, sl = best

        def rha(s, n):
            sign = -1 if s < 0 else 1
            return sign * ((2 * abs(s) + n) // (2 * n))

        return thr, rha(sl, nl), rha(st - sl, nt - nl)

    t1, ml1, mr1 = fit([(q, y) for q, d, y in rows])
    assert (got["thr1"], got["mean_l1"], got["mean_r1"]) == (t1, ml1, mr1)
    resid = [(d, y - (ml1 if q <= t1 else mr1)) for q, d, y in rows]
    t2, ml2, mr2 = fit(resid)
    assert (got["thr2"], got["mean_l2"], got["mean_r2"]) == (t2, ml2, mr2)
    # boosting must actually reduce SSE round over round
    mean_all = round(sum(y for *_, y in rows) / len(rows))
    sse_const = sum((y - mean_all) ** 2 for *_, y in rows)
    sse_1 = sum(r * r for _, r in resid)
    pred2 = [(r - (ml2 if d <= t2 else mr2)) for d, r in resid]
    sse_2 = sum(v * v for v in pred2)
    assert sse_1 < sse_const and sse_2 < sse_1


def test_mutual_information_matches_python_model(spark, sf_dir):
    import math
    from collections import Counter

    from platform_etl_backend_spark.catalog import QUERIES

    got = {r["feature"]: r["mi_nats"]
           for r in QUERIES["q_mutual_information"].fn(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bin",
        "CAST(MONTH(o_orderdate) AS BIGINT) AS order_month",
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS y",
    ).collect()
    n = len(rows)
    for feat in ("price_bin", "order_month"):
        cxy = Counter((r[feat], r["y"]) for r in rows)
        cx = Counter(r[feat] for r in rows)
        cy = Counter(r["y"] for r in rows)
        mi = sum(
            (c / n) * math.log((c * n) / (cx[x] * cy[y]))
            for (x, y), c in cxy.items()
        )
        assert abs(got[feat] - mi) < 1e-5, feat
        assert got[feat] >= 0
    # price actually predicts urgency-by-price-threshold better than month?
    # (no assertion on ordering — priorities are uniform in TPC-H data; the
    # pin is the exact MI values themselves)


def test_brier_decomposition_identity(spark, sf_dir):
    """Murphy: Brier == REL - RES + UNC (up to the documented 9dp term
    rounding and 10-bin within-bin variance, which the decomposition
    absorbs into REL/RES exactly when acc/conf are bin means)."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_brier_decomposition"].fn(spark, sf_dir).collect()[0]
    assert 0 <= got["brier"] <= 1
    assert got["reliability"] >= 0 and got["resolution"] >= 0
    assert 0 <= got["uncertainty"] <= 0.25 + 1e-9
    # identity holds only up to within-bin variance of prob (conf is a
    # bin MEAN) — allow that slack but require the right ballpark
    lhs = got["brier"]
    rhs = got["reliability"] - got["resolution"] + got["uncertainty"]
    assert abs(lhs - rhs) < 0.05, (lhs, rhs)
    # and the classifier must be better than climatology: RES > REL means
    # skill; at minimum brier below uncertainty (some skill)
    assert got["brier"] < got["uncertainty"] + 0.05


def test_tree_depth2_matches_python_cart(spark, sf_dir):
    """Depth-2 level-synchronous CART vs a plain-python exhaustive fit:
    same root threshold, same per-side month thresholds and counts."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = {r["side"]: r for r in QUERIES["q_tree_depth2"].fn(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_totalprice AS x1",
        "CAST(MONTH(o_orderdate) AS BIGINT) AS x2",
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS y",
    ).collect()

    def best_split(pts):
        # pts: list of (x, y); returns (thr, score) minimizing
        # n_l*gini_l + n_r*gini_r over thresholds x <= thr; ties -> min thr
        from collections import Counter

        agg = Counter()
        for x, y in pts:
            agg[x] += 0  # ensure key
        per = {}
        for x, y in pts:
            p, q = per.get(x, (0, 0))
            per[x] = (p + y, q + 1 - y)
        xs = sorted(per)
        tp = sum(p for p, _ in per.values())
        tq = sum(q for _, q in per.values())
        cp = cq = 0
        best = None
        for x in xs:
            p, q = per[x]
            cp += p
            cq += q
            nl, nr = cp + cq, (tp + tq) - (cp + cq)
            if nr == 0:
                continue
            score = (nl - (cp * cp + cq * cq) / nl) + (
                nr - ((tp - cp) ** 2 + (tq - cq) ** 2) / nr
            )
            if best is None or score < best[1] - 1e-12 or (
                abs(score - best[1]) <= 1e-12 and x < best[0]
            ):
                best = (x, score)
        return best

    root_thr, _ = best_split([(r["x1"], r["y"]) for r in rows])
    assert got[0]["root_threshold"] == pytest.approx(root_thr)
    for side in (0, 1):
        pts = [
            (r["x2"], r["y"])
            for r in rows
            if (r["x1"] <= root_thr) == (side == 0)
        ]
        thr2, score2 = best_split(pts)
        assert got[side]["month_threshold"] == thr2
        assert got[side]["weighted_gini_x_n"] == pytest.approx(score2)
        nl = sum(1 for x, _ in pts if x <= thr2)
        assert got[side]["n_left"] == nl
        assert got[side]["n_right"] == len(pts) - nl
        assert got[side]["pos_left"] == sum(y for x, y in pts if x <= thr2)
        assert got[side]["pos_right"] == sum(y for x, y in pts if x > thr2)


def test_ngram_novelty_matches_python_model(spark, sf_dir):
    """First-occurrence trigram novelty vs a plain-python model (same
    whole-doc-when-short rule, round-half-away micro)."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = {
        r["doc_id"]: (r["n_types"], r["n_novel"], r["novelty_micro"])
        for r in QUERIES["q_ngram_novelty"].fn(spark, sf_dir).collect()
    }
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def shingles(text, k=3):
        toks = text.strip().split()
        toks = [t for t in toks if t]
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    per = {r["doc_id"]: shingles(r["text"]) for r in rows}
    first = {}
    for d in sorted(per):
        for s in per[d]:
            first.setdefault(s, d)
    for d, sh in per.items():
        n_types = len(sh)
        n_novel = sum(1 for s in sh if first[s] == d)
        micro = (2 * 1000000 * n_novel + n_types) // (2 * n_types)
        assert got[d] == (n_types, n_novel, micro), d
    assert len(got) == len(per)
