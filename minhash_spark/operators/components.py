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

from minhash_spark.operators.verify import barrier


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


def _driver_union_find(pdf) -> "object":
    """Union-find with path compression over a small collected edge list.
    Union-by-min-code keeps each root at the set's minimum node id (codes are
    sorted-unique positions, so min code == min id)."""
    import numpy as np

    u = pdf["u"].to_numpy()
    v = pdf["v"].to_numpy()
    nodes, codes = np.unique(np.concatenate([u, v]), return_inverse=True)
    cu, cv = codes[: len(u)], codes[len(u) :]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(cu.tolist(), cv.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    import pandas as pd

    return pd.DataFrame({"node": nodes, "component": nodes[roots]})


def connected_components(
    edges: DataFrame,
    max_rounds: int = 50,
    driver_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """edge list (u, v) -> (node, component) with component = min node id.

    Includes every node that appears in an edge; callers union in singletons.
    ``stats``, when passed, is filled in place with observability fields
    ({path, n_edges, rounds}) — used by tools/bench_cc.py to record the
    distributed path's rounds-to-convergence.

    Scale-adaptive (the CC analogue of AQE's broadcast decision): after the
    dedup pass the edge COUNT is known; at or below ``driver_threshold`` the
    edges are collected and solved with O(E α(E)) union-find on the driver —
    a verified near-dup edge list is usually orders of magnitude smaller than
    the input corpus, and 3-4 distributed star-contraction rounds (each 2
    shuffles + a barrier) are pure fixed cost at that size. Above the
    threshold the alternating large/small-star contraction runs as before
    (the 10^12-row path, where edges may be billions).
    """
    cur = edges.select(F.col("u"), F.col("v")).where(F.col("u") != F.col("v")).distinct()
    cur = cur.transform(barrier)
    n_edges = cur.count()
    if stats is not None:
        stats["n_edges"] = n_edges
        stats["path"] = "driver" if n_edges <= driver_threshold else "distributed"
    if n_edges <= driver_threshold:
        spark = edges.sparkSession
        result = _driver_union_find(cur.toPandas())
        if len(result) == 0:
            return spark.createDataFrame([], schema="node long, component long").select(
                F.col("node").cast(dict(edges.dtypes)["u"]).alias("node"),
                F.col("component").cast(dict(edges.dtypes)["u"]).alias("component"),
            )
        return spark.createDataFrame(result)
    prev, prev_fp = cur, None
    for rnd in range(max_rounds):
        if stats is not None:
            stats["rounds"] = rnd + 1
        cur = _small_star(_large_star(prev)).transform(barrier)
        fp = _edge_fingerprint(cur)
        # fingerprint equality is the FAST suspicion check; a (count,
        # hash-sum) collision between different edge sets would otherwise
        # terminate early with wrong components, so the suspected fixpoint
        # is confirmed with an exact set comparison (runs once, at
        # convergence — not per round)
        if fp == prev_fp and cur.exceptAll(prev).isEmpty():
            break
        prev, prev_fp = cur, fp
    else:  # pragma: no cover
        raise RuntimeError("connected_components did not converge")
    # fixpoint is a star graph: v is the component minimum for each u
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(centers).groupBy("node").agg(F.min("component").alias("component"))
