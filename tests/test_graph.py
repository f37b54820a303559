from __future__ import annotations

from platform_etl_backend_spark.operators.graph import (
    closure_tables,
    driver_closure,
    transitive_closure,
)

# Toy DAG mirroring the reference's GraphNodeTest 5-node shape
# (backend/Graph/GraphNodeTest.scala:19-31):
#   r -> a -> c, r -> b -> c, c -> d
EDGES = [("r", "a"), ("r", "b"), ("a", "c"), ("b", "c"), ("c", "d")]


def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_transitive_closure(spark):
    clo = transitive_closure(edges_df(spark))
    pairs = {(r.ancestor, r.descendant) for r in clo.collect()}
    assert pairs == {
        ("r", "a"), ("r", "b"), ("r", "c"), ("r", "d"),
        ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    }


def test_closure_tables(spark):
    out = {r.id: r for r in closure_tables(edges_df(spark)).collect()}
    assert out["c"].ancestors == ["a", "b", "r"]
    assert out["c"].descendants == ["d"]
    assert out["c"].parents == ["a", "b"]
    assert out["c"].children == ["d"]
    assert out["r"].ancestors == []
    assert out["d"].descendants == []


def test_driver_closure_paths(spark):
    info = driver_closure(edges_df(spark))
    assert info["d"]["ancestors"] == ["a", "b", "c", "r"]
    assert info["d"]["paths"] == [["r", "a", "c", "d"], ["r", "b", "c", "d"]]
    assert info["r"]["paths"] == [["r"]]


def test_driver_closure_drops_cycles(spark):
    df = spark.createDataFrame(EDGES + [("d", "r")], ["src", "dst"])
    info = driver_closure(df)
    assert info["d"]["ancestors"] == ["a", "b", "c", "r"]
