"""Structured Streaming: incremental embedding near-dup ingest (continuous
SemDeDup).

The batch operator (plans/queries.py q_embedding_near_dup_pairs) dedups a
static embeddings table; a production training-data pipeline ingests vectors
continuously and wants every NEW vector checked against accumulated history
the moment it lands. Per micro-batch: new vectors -> hyperplane-LSH bucket
keys (the SAME seeded family as the batch path, functions/embeddings.py, so
batch state and streamed state bucket identically) -> candidates against the
accumulated bucket table via the shared history-anchored star-capped
``lsh.incremental_candidate_pairs`` -> exact-cosine verification -> edges
appended per batch_id (idempotent on foreachBatch replay), with optional
clusters maintained by the scale-adaptive connected-components operator.

Scale notes: the per-batch work is one Arrow matmul over the batch plus a
bucket-key equi-join bounded by |new| x matching buckets — never
history x history. Vector payloads stay OUT of the candidate shuffle (id
pairs only, 16 B/row); vectors join back once per distinct surviving pair.
State lives in plain append tables partitioned by batch_id, restart-safe via
the streaming checkpoint dir (same layout contract as incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minhash_spark.functions.embeddings import ann_bucket_udf, cosine_col
from minhash_spark.operators import lsh
from minhash_spark.operators.verify import barrier
from minhash_spark.streaming.incremental import _history_partitions_exist

VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

EMB_STREAM_MAX_BUCKET = int(os.environ.get("SPARK_GRAFT_EMB_STREAM_MAX_BUCKET", "2000"))


def embedding_stream(spark: SparkSession, input_dir: str, dim: int = 64) -> DataFrame:
    """readStream(vectors) -> streaming DataFrame of (vec_id, v, buckets).

    A narrow map: cast to double BEFORE any arithmetic (float32 products
    would make cosine order-dependent), one Arrow matmul for the L*b
    hyperplane signs."""
    stream = spark.readStream.schema(VECTORS_SCHEMA).parquet(input_dir)
    return stream.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("buckets", ann_bucket_udf(dim=dim)(F.col("v")))


def run_incremental_embedding_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    tau: float = 0.45,
    dim: int = 64,
    maintain_clusters: bool = False,
    max_bucket_size: int = EMB_STREAM_MAX_BUCKET,
) -> None:
    """Incremental embedding near-dup: per micro-batch, new vectors' bucket
    keys join the accumulated bucket table; candidate pairs (new x history
    plus new x new) are cosine-verified at ``tau`` and appended to edges.

    State tables under ``state_dir``: vectors/ (append, batch_id-partitioned
    — retained so later batches can exact-verify new-vs-history candidates;
    at scale swap for a pointer into the source table), edges/ (append), and
    with ``maintain_clusters`` clusters/ (rebuilt per batch from ALL edges —
    cheap because the verified edge set is orders of magnitude smaller than
    the corpus; same rationale as incremental.py)."""
    vec_dir = os.path.join(state_dir, "vectors")
    edges_dir = os.path.join(state_dir, "edges")
    clusters_dir = os.path.join(state_dir, "clusters")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.transform(barrier)
        if batch_df.isEmpty():
            return
        new_vecs = batch_df.select("vec_id", "v", "buckets")
        # history = previously committed batches only; same two choices as
        # incremental.py: loud-fail probe (a swallowed read error would
        # permanently lose new-vs-history edges) and exclude THIS batch_id
        # (foreachBatch is at-least-once; a replayed attempt's own partition
        # is already on disk).
        hist = None
        if _history_partitions_exist(spark, vec_dir):
            hist = (
                spark.read.parquet(vec_dir)
                .where(F.col("batch_id") != batch_id)
                .select("vec_id", "v", "buckets")
            )
        union = new_vecs.withColumn("is_new", F.lit(True))
        if hist is not None:
            union = union.unionByName(hist.withColumn("is_new", F.lit(False)))
        new_buckets = new_vecs.select("vec_id", F.explode("buckets").alias("bucket"))
        all_buckets = union.select(
            "vec_id", "is_new", F.explode("buckets").alias("bucket")
        )
        # dense SemDeDup regions accumulate unbounded same-bucket history —
        # the shared history-anchored star cap bounds per-batch candidates
        # at O(|new|) per oversized bucket while keeping new-vs-history
        # connectivity through the stable history minimum
        cand = lsh.incremental_candidate_pairs(
            new_buckets,
            all_buckets,
            max_bucket_size,
            key_col="bucket",
            id_col="vec_id",
        )
        vecs_only = union.select("vec_id", "v")
        scored = (
            cand.join(
                vecs_only.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va")),
                "a_id",
            )
            .join(
                vecs_only.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb")),
                "b_id",
            )
            .select(
                "a_id", "b_id", cosine_col(F.col("va"), F.col("vb")).alias("cos")
            )
        )
        edges = scored.where(F.col("cos") >= tau).select(
            "a_id", "b_id", F.round("cos", 4).alias("cos_sim")
        )
        # per-batch_id subdirectories in overwrite mode: a replayed batch
        # rewrites (not duplicates) its own slice — idempotent commit
        edges.write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch_id={batch_id}")
        )
        new_vecs.write.mode("overwrite").parquet(
            os.path.join(vec_dir, f"batch_id={batch_id}")
        )
        if maintain_clusters:
            from minhash_spark.operators import components

            all_edges = spark.read.parquet(edges_dir).select(
                F.col("a_id").alias("u"), F.col("b_id").alias("v")
            )
            all_ids = spark.read.parquet(vec_dir).select(
                F.col("vec_id").alias("node")
            )
            comp = components.connected_components(all_edges)
            clustered = all_ids.join(comp, "node", "left").select(
                F.col("node").alias("vec_id"),
                F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
            )
            # localCheckpoint first: the plan reads vec_dir, which this batch
            # also appended — Spark cannot overwrite a path feeding the plan
            clustered.transform(barrier).write.mode("overwrite").parquet(clusters_dir)

    q = (
        embedding_stream(spark, input_dir, dim=dim)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
