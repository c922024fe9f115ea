"""Bucketed persistent layout — shuffle-free co-located joins at scale.

At 10^12 rows the dominant shuffles in the dedup pipeline are (a) the LSH
bucket table's self-equi-join on ``band_hash`` (candidate generation, P5)
and (b) every incremental batch's new-vs-history join on the same key.
Persisting the bucket table **bucketed by the join key** (Spark DataSource
bucketing: ``bucketBy(n, key).sortBy(key)``) makes both joins exchange-free:
each side's physical layout already satisfies the join's required
hash-partitioning, so SortMergeJoin runs directly over co-located bucket
files — no 100 TB shuffle, re-paid on every run, for a table written once.

The reference stores signatures as an indexed keyword (the ES postings list
IS its lookup layout, MinHashFieldMapper.java:280-288); the bucketed table
is the Spark-native analogue of that persistent inverted structure.

Sandbox notes (real on a cluster, session-scoped here): table metadata lives
in the session catalog (``spark.sql.catalogImplementation=in-memory`` — no
Hive metastore in this sandbox); on a real deployment the same code writes
through a shared metastore or an Iceberg catalog with a ``bucket(n, key)``
partition transform and the layout survives across jobs. Data files are
plain parquet either way, at ``path`` when given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_col: str,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` (optionally sorted
    within buckets — sorted buckets let SortMergeJoin skip its per-task
    sort). ``n_buckets`` sizes the layout: pick ~(table bytes / 256 MB),
    fixed for the table's lifetime so every later reader/join agrees."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back WITH bucketing metadata (``spark.table``, not
    ``read.parquet`` — a raw path read would discard the layout and re-pay
    the shuffle)."""
    return spark.table(table)


def colocated_self_pairs(
    buckets: DataFrame, key: str = "band_hash", id_col: str = "rep_id"
) -> DataFrame:
    """Candidate pairs from a bucketed bucket table: the equi-join on
    ``key`` requires hashpartitioning(key) on both sides, which the bucketed
    layout already provides — the executed plan contains NO Exchange
    (asserted in tests/test_bucketed.py)."""
    from pyspark.sql import functions as F

    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, on=key)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
    )


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in df's executed physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange " in line and "BroadcastExchange" not in line
    )
