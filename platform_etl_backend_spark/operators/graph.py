"""DAG / graph-closure operators.

Reference semantics: ``graph/GraphNode.scala:27-92`` builds a JGraphT DAG on
the driver from a collected vertices/edges DataFrame and derives per-node
ancestors, descendants, children, parents and all root-paths — used only for
the Reactome pathway ontology (~2.6k vertices).

Two ports:
- ``driver_closure``: same collect-to-driver shape with networkx —
  appropriate for small ontologies (the reference's actual workload).
- ``transitive_closure`` / ``ancestors``: distributed iterative-join BFS —
  the Spark-native scale path when the graph doesn't fit the driver. Each
  round extends frontier paths by one hop (a shuffle join on the edge key);
  terminates at fixpoint. Edge table is broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    nx = None


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    broadcast_edges: bool = True,
) -> DataFrame:
    """All (ancestor, descendant) pairs of a DAG by iterative join.

    Doubles path length per round via closure∘closure? No — extends by one
    edge hop per round (edges are usually shallow ontologies; hop-joins keep
    every round a small broadcast join instead of a growing self-join).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("d")).distinct()
    # localCheckpoint truncates lineage each round — without it the
    # iteratively-unioned plan grows exponentially and kills the planner.
    closure = e.localCheckpoint()
    frontier = closure
    hop = e.select(F.col("a").alias("j"), F.col("d").alias("d2"))
    for _ in range(max_iter):
        e_step = F.broadcast(hop) if broadcast_edges else hop
        nxt = (
            frontier.select("a", F.col("d").alias("j"))
            .join(e_step, "j")
            .select("a", F.col("d2").alias("d"))
            .distinct()
        )
        new = nxt.join(closure, ["a", "d"], "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        closure = closure.unionByName(new).localCheckpoint()
        frontier = new
    return closure.select(F.col("a").alias("ancestor"), F.col("d").alias("descendant"))


def closure_tables(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node ancestors/descendants/parents/children arrays (sorted), via
    the distributed closure — the Spark-native version of GraphNode's output
    schema (GraphNode.scala:54-92)."""
    clo = transitive_closure(edges, src, dst)
    e = edges.select(F.col(src).alias("parent"), F.col(dst).alias("child")).distinct()
    nodes = (
        e.select(F.col("parent").alias("id"))
        .unionByName(e.select(F.col("child").alias("id")))
        .distinct()
    )
    ancestors = clo.groupBy(F.col("descendant").alias("id")).agg(
        F.sort_array(F.collect_set("ancestor")).alias("ancestors")
    )
    descendants = clo.groupBy(F.col("ancestor").alias("id")).agg(
        F.sort_array(F.collect_set("descendant")).alias("descendants")
    )
    parents = e.groupBy(F.col("child").alias("id")).agg(
        F.sort_array(F.collect_set("parent")).alias("parents")
    )
    children = e.groupBy(F.col("parent").alias("id")).agg(
        F.sort_array(F.collect_set("child")).alias("children")
    )
    empty = F.array().cast("array<string>")
    out = (
        nodes.join(ancestors, "id", "left")
        .join(descendants, "id", "left")
        .join(parents, "id", "left")
        .join(children, "id", "left")
    )
    return out.select(
        "id",
        *[
            F.coalesce(F.col(c).cast("array<string>"), empty).alias(c)
            for c in ("ancestors", "descendants", "parents", "children")
        ],
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    The Spark-native dedup-clustering primitive: near-duplicate PAIRS
    (from MinHash/Jaccard/embedding operators) become duplicate GROUPS.
    Each round every node adopts the minimum label among itself and its
    neighbors; converges in O(component diameter) rounds. Lineage is cut
    per round with localCheckpoint. Returns (node, component) where
    component is the minimum node id in the component.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    return labels


def driver_closure(edges: DataFrame, src: str = "src", dst: str = "dst"):
    """Collect-to-driver networkx closure (reference-parity path for small
    ontologies; GraphNode.scala:45-48 does exactly this collect).

    Returns dict: id -> {ancestors, descendants, parents, children,
    path: list of root-paths}.
    """
    if nx is None:  # pragma: no cover
        raise ImportError("networkx unavailable")
    g = nx.DiGraph()
    for row in edges.select(src, dst).distinct().collect():
        if row[0] is not None and row[1] is not None:
            g.add_edge(row[0], row[1])
    # drop cycles like GraphNode.scala:33-40 (log & skip back-edges)
    while True:
        try:
            cycle = nx.find_cycle(g)
        except nx.NetworkXNoCycle:
            break
        g.remove_edge(*cycle[-1][:2])
    roots = [n for n in g.nodes if g.in_degree(n) == 0]
    out = {}
    for n in g.nodes:
        paths = []
        for r in roots:
            paths.extend(nx.all_simple_paths(g, r, n))
        out[n] = {
            "ancestors": sorted(nx.ancestors(g, n)),
            "descendants": sorted(nx.descendants(g, n)),
            "parents": sorted(g.predecessors(n)),
            "children": sorted(g.successors(n)),
            "paths": sorted(paths) if paths else ([[n]] if n in roots else []),
        }
    return out
