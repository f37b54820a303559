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
