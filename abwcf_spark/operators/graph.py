"""Distributed connected components — the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14), expressed as DataFrame self-joins.

Why this algorithm at 100 TB: each iteration is two groupBy/join passes
over the CURRENT edge set (which never grows — both stars only re-point
edges toward component minima), and the number of iterations is
O(log n) on any graph (in practice 2-4 for near-duplicate graphs, whose
components are small clusters).  No adjacency list is ever collected to
one machine, no component is materialized as a row — every step is a
key-partitioned shuffle Catalyst can plan.

Reference scope note: the reference crawler (amin-aoulkadi/ABWCF) has no
graph operator — this is part of the training-data pipeline surface
(near-duplicate CLUSTERING: pair detection alone cannot answer "which
rows do I drop"; the component representative can).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("_m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Group every edge at its LARGER endpoint; connect the smaller
    endpoints (and the larger endpoint itself) to the group minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("_m"))
    moved = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    self_edges = mins.select("u", F.col("_m").alias("v"))
    return (
        moved.unionByName(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_multiset_equal(a: DataFrame, b: DataFrame) -> bool:
    """Exact: same count and empty one-sided multiset difference (both
    sides are distinct edge sets, so count + one-sided except suffices)."""
    ca, cb = a.count(), b.count()
    if ca != cb:
        return False
    return a.exceptAll(b).isEmpty()


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iter: int = 30
) -> DataFrame:
    """→ (node, component) for every node incident to an edge; component =
    the minimum node id of its connected component.

    ``edges``: undirected edge list in columns ``a``/``b`` (any orderable
    numeric/string type; a node whose only edges are self-loops labels
    itself).  Iterates large-star /
    small-star to convergence (checked EXACTLY: the star passes leave the
    edge set unchanged only at the fixed point, where edges form stars
    rooted at component minima).  Each iteration localCheckpoints the edge
    set: the lineage (and Catalyst's multiplicative join-size stats) would
    otherwise compound across iterations.

    Superseded per-iteration checkpoint blocks are NOT explicitly freed —
    DataFrame.unpersist() does not release localCheckpoint block storage
    (verified on PySpark 4.1.2); they are reclaimed by the ContextCleaner
    once the superseded Dataset is garbage-collected.  Retention is bounded
    meanwhile: the edge set never grows past the input pair list, iteration
    count is O(log n) (max_iter-capped), and the blocks are
    MEMORY_AND_DISK — excess spills to disk rather than pressuring the
    executor heap.
    """
    raw = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = (
        raw.where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        if _edge_multiset_equal(nxt, cur):
            cur = nxt
            break
        cur = nxt
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    # fixed point = stars: every edge is (member, root); roots label
    # themselves, as does any node whose edges were all self-loops
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    labeled = members.unionByName(
        cur.select(F.col("v").alias("node")).withColumn(
            "component", F.col("node")
        )
    ).distinct()
    singletons = all_nodes.join(labeled, "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return labeled.unionByName(singletons)
