"""Bucketed-layout co-location: the P5 candidate self-join over a table
written with ``bucketBy(n, band_hash)`` must execute WITHOUT a shuffle
Exchange, and must produce exactly the pairs the shuffled path produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minhash_spark.sources import bucketed as B


@pytest.fixture(scope="module")
def bucket_rows(spark):
    # synthetic bucket table: 400 (band_hash, rep_id) memberships, with one
    # hot bucket (hash 7) to make co-located join non-trivial
    rows = [(int(h), int(r)) for h in range(100) for r in (h, h + 1000)]
    rows += [(7, 2000 + i) for i in range(20)]
    return spark.createDataFrame(rows, "band_hash long, rep_id long")


def _expected_pairs(rows_df):
    a, b = rows_df.alias("a"), rows_df.alias("b")
    return set(
        a.join(b, "band_hash")
        .where(F.col("a.rep_id") < F.col("b.rep_id"))
        .select(F.col("a.rep_id").alias("x"), F.col("b.rep_id").alias("y"))
        .distinct()
        .rdd.map(tuple)
        .collect()
    )


def test_bucketed_join_plan_and_values(spark, bucket_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "bt")
    spark.sql("DROP TABLE IF EXISTS bt_buckets")
    B.write_bucketed(
        bucket_rows, "bt_buckets", n_buckets=8, bucket_col="band_hash",
        sort_col="band_hash", path=path,
    )
    tbl = B.read_bucketed(spark, "bt_buckets")
    # force SMJ so the absence of Exchange is the bucketing, not a broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = B.colocated_self_pairs(tbl)
        got = set(pairs.distinct().rdd.map(tuple).collect())
        assert got == {
            (x, y)
            for (x, y) in _expected_pairs(bucket_rows)
        }
        assert B.n_exchanges(pairs) == 0, (
            "bucketed self-join must not shuffle:\n"
            + pairs._jdf.queryExecution().executedPlan().toString()
        )
        # the same join over a PATH read (layout metadata discarded) shuffles —
        # proves the zero above is the bucketing, not the data size
        raw = spark.read.parquet(path)
        raw_pairs = B.colocated_self_pairs(raw)
        raw_pairs.collect()
        assert B.n_exchanges(raw_pairs) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_buckets")
