"""CC scale-adaptivity at the driver_threshold boundary (VERDICT r2 item 9):
above the threshold the distributed large/small-star path runs; it must
agree exactly with driver union-find on the same >1M-edge graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from minhash_spark.operators.components import connected_components


def _chain_edges(spark, n_chains: int, chain_len: int):
    """n_chains disjoint path graphs of chain_len nodes each; expected
    component of node x is (x // chain_len) * chain_len."""
    per = chain_len - 1
    return (
        spark.range(n_chains * per)
        .select(
            ((F.col("id") / per).cast("long") * chain_len + F.col("id") % per).alias("u"),
        )
        .select("u", (F.col("u") + 1).alias("v"))
    )


def test_star_path_crosses_driver_threshold_and_agrees(spark):
    n_chains, chain_len = 15_152, 100
    edges = _chain_edges(spark, n_chains, chain_len)
    n_edges = edges.count()
    assert n_edges == n_chains * (chain_len - 1) and n_edges > 1_000_000

    expected = (F.floor(F.col("node") / chain_len) * chain_len).cast("long")

    # distributed star path (edge count is ABOVE the default threshold)
    star = connected_components(edges, driver_threshold=1_000_000)
    assert star.count() == n_chains * chain_len
    assert star.where(F.col("component") != expected).count() == 0

    # driver union-find path on the SAME graph (threshold raised above it)
    uf = connected_components(edges, driver_threshold=10_000_000)
    assert uf.count() == n_chains * chain_len
    assert uf.where(F.col("component") != expected).count() == 0
