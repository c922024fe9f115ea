"""Stage P7: distributed connected components — alternating large-star /
small-star contractions (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC 2014; public algorithm — the reference has no counterpart,
SURVEY §2.2 'absent from the reference').

Pure DataFrame ops (groupBy + join), no UDFs. Each round strictly reduces the
potential function; converges in O(log n) rounds even on path graphs — near-dup
components are mostly dense (quasi-cliques), so 2-4 rounds typical.
``localCheckpoint`` truncates lineage per round (SURVEY §4.2: iteration is the
one thing Catalyst does not give us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    und = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        und.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; connect smaller neighbors (and u) to the min."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    nbrs = e.join(m, "u").select(F.col("v").alias("n"), F.col("m"), F.col("u").alias("center"))
    self_edges = m.select(F.col("u").alias("n"), F.col("m"), F.col("u").alias("center"))
    return (
        nbrs.union(self_edges)
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """edge list (u, v) -> (node, component) with component = min node id.

    Includes every node that appears in an edge; callers union in singletons.
    """
    cur = edges.select(F.col("u"), F.col("v")).where(F.col("u") != F.col("v")).distinct()
    cur = cur.localCheckpoint()
    prev_fp = None
    for _ in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:  # pragma: no cover
        raise RuntimeError("connected_components did not converge")
    # fixpoint is a star graph: v is the component minimum for each u
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(centers).groupBy("node").agg(F.min("component").alias("component"))
