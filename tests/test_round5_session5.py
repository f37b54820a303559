"""Round-5 session-5 operators: ANOVA F, Benjamini-Hochberg FDR,
Theil-Sen slope, Adamic-Adar link prediction, MMR reranking — pinned
against plain-Python models."""

from __future__ import annotations

import math

from platform_etl_backend_spark.catalog import QUERIES
from tests.conftest import load


def _events(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    return events_table(spark, sf_dir).select(
        "event_type", "value", "user_id", "ep"
    ).collect()


def test_anova_f_matches_python(spark, sf_dir):
    rows = _events(spark, sf_dir)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(round(r.value, 6))
    k = len(by_type)
    n = sum(len(v) for v in by_type.values())
    sum_sq_over_n = sum(
        round(sum(v) ** 2 / len(v), 6) for v in by_type.values()
    )
    s = sum(sum(v) for v in by_type.values())
    ss = sum(sum(round(x * x, 6) for x in v) for v in by_type.values())
    msb = (sum_sq_over_n - s * s / n) / (k - 1)
    msw = (ss - sum_sq_over_n) / (n - k)
    got = QUERIES["q_anova_f"].fn(spark, sf_dir).collect()[0]
    assert (got.k, got.n) == (k, n)
    assert abs(got.msb - msb) < 1e-3 * max(1.0, abs(msb))
    assert abs(got.msw - msw) < 1e-3 * max(1.0, abs(msw))
    assert abs(got.f_stat - msb / msw) < 1e-3 * max(1.0, abs(msb / msw))
    assert got.f_stat > 0


def test_bh_fdr_mechanics(spark, sf_dir):
    rows = QUERIES["q_bh_fdr"].fn(spark, sf_dir).collect()
    m = len(rows)
    assert [r.i for r in rows] == list(range(1, m + 1))
    ps = [r.p_nano for r in rows]
    assert ps == sorted(ps)
    # adjusted p = backward cummin of round-half-away(m*p/i), clamped at 1e9
    raw = [
        min((2 * m * p + i) // (2 * i), 10**9)
        for i, p in zip(range(1, m + 1), ps)
    ]
    adj = [min(raw[j] for j in range(i, m)) for i in range(m)]
    assert [r.adj_p_nano for r in rows] == adj
    # step-up rejection region is a prefix ending at the LAST passing index
    passing = [r.i for r in rows if r.p_nano * m <= r.i * 50_000_000]
    i_max = max(passing) if passing else 0
    assert [r.rejected for r in rows] == [
        1 if r.i <= i_max and i_max > 0 else 0 for r in rows
    ]


def test_theil_sen_matches_python(spark, sf_dir):
    rows = _events(spark, sf_dir)
    daily: dict[int, int] = {}
    for r in rows:
        daily[r.ep // 86400] = daily.get(r.ep // 86400, 0) + round(
            round(r.value, 6) * 1e6
        )
    days = sorted(daily)
    slopes = []
    for ai in range(len(days)):
        for bi in range(ai + 1, len(days)):
            i, j = days[ai], days[bi]
            slopes.append(((daily[j] - daily[i]) / (j - i), i, j))
    slopes.sort()
    n_pairs = len(slopes)
    med = slopes[(n_pairs + 1) // 2 - 1][0]
    got = QUERIES["q_theil_sen"].fn(spark, sf_dir).collect()
    assert len(got) == 1
    assert got[0].n_pairs == n_pairs
    assert abs(got[0].slope_micro_per_day - round(med, 6)) <= 1e-6


def test_adamic_adar_matches_python(spark, sf_dir):
    rows = _events(spark, sf_dir)
    edges = set()
    for r in rows:
        a, b = r.user_id % 50, int(math.floor(r.value)) % 50
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    scores = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in edges:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            aa = sum(round(1.0 / math.log(deg[w]), 6) for w in common)
            scores[(u, v)] = (len(common), aa)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = [
        (r.u, r.v, r.common_neighbors, r.aa_score)
        for r in QUERIES["q_adamic_adar"].fn(spark, sf_dir).collect()
    ]
    assert [(u, v, c, round(a, 6)) for (u, v), (c, a) in top] == [
        (u, v, c, round(a, 6)) for u, v, c, a in got
    ]
    # predicted links are genuinely absent from the graph
    for u, v, _, _ in got:
        assert (u, v) not in edges


def test_mmr_rerank_matches_python(spark, sf_dir):
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def cos_micro(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(round(d / (na * nb), 6) * 1e6)

    q = emb[0]
    rel = {i: cos_micro(q, v) for i, v in emb.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:16]
    sel = [min(cand, key=lambda i: (-rel[i], i))]
    scores = {1: 7 * rel[sel[0]]}
    for pos in range(2, 9):
        best = None
        for c in cand:
            if c in sel:
                continue
            ms = max(cos_micro(emb[c], emb[s]) for s in sel)
            sc = 7 * rel[c] - 3 * ms
            key = (-sc, c)
            if best is None or key < best[0]:
                best = (key, c, sc)
        sel.append(best[1])
        scores[pos] = best[2]
    got = QUERIES["q_mmr_rerank"].fn(spark, sf_dir).collect()
    assert [(r.pos, r.vec_id, r.score_milli) for r in got] == [
        (p + 1, v, scores[p + 1]) for p, v in enumerate(sel)
    ]
    # MMR must diversify: the greedy order differs from pure relevance order
    assert [r.vec_id for r in got] != cand[:8]
