"""PageRank and triangle-count operator tests: reference values are
computed independently (dense numpy power iteration; itertools brute
force), not by re-running the operator's own formulation."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from platform_etl_backend_spark.operators.graph import pagerank, triangle_count

# small directed graph with branching, a cycle, and a dangling node (5)
PR_EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 5), (2, 5)]


def test_pagerank_matches_dense_power_iteration(spark):
    e = spark.createDataFrame(PR_EDGES, ["src", "dst"])
    got = {r.node: r.pr for r in pagerank(e, iterations=5).collect()}

    nodes = sorted({n for ab in PR_EDGES for n in ab})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in PR_EDGES:
        outdeg[idx[s]] += 1
    pr = np.full(n, round(1.0 / n, 9))
    for _ in range(5):
        nxt = np.full(n, round(0.15 / n, 9))
        for s, d in PR_EDGES:
            nxt[idx[d]] += round(pr[idx[s]] * 0.85 / outdeg[idx[s]], 9)
        pr = nxt
    want = {nd: round(pr[idx[nd]], 6) for nd in nodes}
    assert set(got) == set(want)
    for nd in nodes:
        assert got[nd] == pytest.approx(want[nd], abs=2e-6), nd
    # simplified variant: dangling node 5 leaks rank, total < 1
    assert sum(got.values()) < 1.0


def test_pagerank_partitioning_invariant(spark):
    e = spark.createDataFrame(PR_EDGES, ["src", "dst"])
    a = {r.node: r.pr for r in pagerank(e, iterations=4).collect()}
    b = {r.node: r.pr for r in pagerank(e.repartition(7), iterations=4).collect()}
    assert a == b  # decimal contribution sums: bit-identical at any layout


TRI_EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 1), (2, 2), (4, 3)]


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for ab in und for n in ab})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= und
    )


def test_triangle_count_matches_brute_force(spark):
    e = spark.createDataFrame(TRI_EDGES, ["src", "dst"])
    row = triangle_count(e).collect()[0]
    und = {tuple(sorted(x)) for x in TRI_EDGES if x[0] != x[1]}
    assert row.n_edges == len(und)
    assert row.n_nodes == len({n for ab in und for n in ab})
    assert row.n_triangles == _brute_triangles(TRI_EDGES)
    # degree orientation: every triangle closes exactly one wedge, so
    # wedge count bounds and triangle count never exceeds it
    assert row.n_wedges >= row.n_triangles


def test_triangle_count_clique(spark):
    # K5: C(5,3)=10 triangles, C(5,2)=10 edges, every wedge closes
    edges = list(itertools.combinations(range(5), 2))
    e = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(e).collect()[0]
    assert (row.n_edges, row.n_triangles) == (10, 10)
    assert row.n_wedges == 10  # oriented K5 wedge count == triangle count


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: LPA collapses each
    clique to its minimum node id and the bridge does not merge them."""
    from platform_etl_backend_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        clique1 + clique2 + [(3, 10)], "src bigint, dst bigint"
    )
    out = label_propagation(edges, iterations=5)
    got = {r["node"]: r["community"] for r in out.collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_label_propagation_deterministic_across_partitioning(spark):
    """Same labels at different parallelism — the (count, -label) argmax has
    no partitioning dependence."""
    from platform_etl_backend_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7) for i in range(20) if i % 7 != (i * 3 + 1) % 7],
        "src bigint, dst bigint",
    )
    a = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(edges.repartition(13), iterations=3).collect()))
    assert a == b


def test_sssp_weighted_vs_dijkstra(spark):
    """Min-plus rounds must reproduce exact Dijkstra distances on a small
    weighted digraph where the cheapest path is NOT the fewest-hops path."""
    import heapq
    from platform_etl_backend_spark.operators.graph import sssp

    edges = [
        (0, 1, 10), (0, 2, 1), (2, 1, 1),     # 0->1 direct 10, via 2: 2
        (1, 3, 1), (2, 3, 100), (3, 4, 1),
        (0, 4, 50),
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    got = {r["node"]: r["dist"] for r in sssp(df, sources=[0], rounds=8).collect()}

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got == dist


def test_sssp_parallel_edges_keep_cheapest(spark):
    from platform_etl_backend_spark.operators.graph import sssp

    df = spark.createDataFrame(
        [(0, 1, 5), (0, 1, 2), (0, 1, 9)], "src bigint, dst bigint, w bigint"
    )
    got = {r["node"]: r["dist"] for r in sssp(df, sources=[0], rounds=3).collect()}
    assert got == {0: 0, 1: 2}


def test_kcore_fixed_rounds_reach_fixpoint_and_hand_graph(spark, sf_dir):
    """(1) The catalog's 8-round budget is the true fixpoint on the events
    graph (round 9 output identical). (2) Hand-checked: a 4-clique with a
    pendant path — the 3-core is exactly the clique, every core degree 3."""
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.operators.graph import k_core

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = F.col("user_id").cast("bigint") % 50
    b = F.floor(F.col("value")).cast("bigint") % 50
    edges = ev.where(a != b).select(a.alias("src"), b.alias("dst"))
    r8 = {(r["node"], r["core_deg"]) for r in k_core(edges, 3, rounds=8).collect()}
    r9 = {(r["node"], r["core_deg"]) for r in k_core(edges, 3, rounds=9).collect()}
    assert r8 == r9
    assert len(r8) > 0  # non-degenerate on the catalog graph

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    path = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + path, "src bigint, dst bigint")
    core = {(r["node"], r["core_deg"]) for r in k_core(df, 3, rounds=6).collect()}
    assert core == {(0, 3), (1, 3), (2, 3), (3, 3)}
