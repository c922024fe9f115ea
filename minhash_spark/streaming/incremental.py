"""Structured Streaming: incremental signature ingest + incremental dedup.

The reference computes signatures at document-index time (ingest path,
MinHashFieldMapper.parseCreateField); the streaming analogue is a
``readStream`` over a landing directory of parquet files batches ->
signature UDF -> append sink, plus an incremental candidate/verify step per
micro-batch (new docs join the ACCUMULATED bucket table, so each file is
compared only against history + its own batch, never recomputed).

Scale notes: the per-batch work is the same narrow kernel map as the batch
pipeline; the history join is bucket-key equi-join (shuffle bounded by new
rows x matching buckets). State lives in plain append tables, not Spark
state stores — restart-safe via the streaming checkpoint dir.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import minhash_struct_udf
from minhash_spark.operators import lsh, verify
from minhash_spark.operators.verify import barrier


def _history_partitions_exist(spark: SparkSession, sig_dir: str) -> bool:
    """True iff ``sig_dir`` exists and holds >= 1 ``batch_id=`` partition.

    Probes through the Hadoop FileSystem API (resolved from the path's own
    scheme), not os.listdir: with an HDFS/S3 state_dir a local listing sees
    nothing, history would silently be treated as absent, and new-vs-history
    edges would be permanently skipped. Path-not-found is the only condition
    treated as "no history"; any other error propagates and fails the batch
    (at-least-once replay retries it).

    Under Spark Connect there is no py4j gateway (``spark._jvm`` is absent),
    so for local paths — the only scheme a gateway-less probe can serve —
    fall back to an os.listdir probe; a remote-scheme sig_dir without a
    gateway is a configuration we cannot probe and must fail loudly rather
    than silently dropping history."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:
        scheme = urlparse(sig_dir).scheme
        if scheme not in ("", "file"):
            raise RuntimeError(
                "history probe needs a JVM gateway for non-local sig_dir "
                f"scheme {scheme!r} (Spark Connect session?)"
            )
        local = urlparse(sig_dir).path if scheme == "file" else sig_dir
        if not os.path.isdir(local):
            return False
        return any(n.startswith("batch_id=") for n in os.listdir(local))
    path = jvm.org.apache.hadoop.fs.Path(sig_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    return any(
        st.getPath().getName().startswith("batch_id=")
        for st in fs.listStatus(path)
    )


FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def signature_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: MinHashConfig,
    curate: bool = False,
    license_allow: list[str] | None = None,
) -> DataFrame:
    """readStream(files) -> streaming DataFrame of signatures (narrow map).

    ``curate=True`` applies the SAME curation pass as the batch pipeline
    (plans/curate.py) inside the stream: drop files failing the code-quality
    filter, redact secrets BEFORE hashing — so streamed state and batch
    state stay signature-compatible (a redacted twin dedups identically on
    both paths). ``license_allow`` adds the batch pipeline's license gate
    (keep only the listed license families), applied FIRST like the batch
    filter stage. All steps are native Column expressions; the stream stays
    a narrow map."""
    from minhash_spark.functions.udfs import file_id_col

    sig = minhash_struct_udf(cfg)
    stream = spark.readStream.schema(FILES_SCHEMA).parquet(input_dir)
    if license_allow is not None:
        from minhash_spark.operators.curation import license_columns

        stream = stream.where(
            license_columns(F.col("content"))["license_family"].isin(license_allow)
        )
    if curate:
        from minhash_spark.operators.curation import (
            code_filter_reason,
            path_filter_reason,
            redact_secrets,
        )

        stream = (
            stream.where(path_filter_reason(F.col("path")) == "ok")
            .where(code_filter_reason(F.col("content")) == "ok")
            .withColumn("content", redact_secrets(F.col("content")))
        )
    return (
        stream.withColumn("file_id", file_id_col())
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("s", sig(F.col("content")))
        .select(
            "file_id",
            "repo",
            "path",
            "commit",
            "lang",
            "content",
            "content_sha256",
            F.col("s.sig").alias("sig"),
            F.col("s.sig_b64").alias("sig_b64"),
            F.col("s.bands").alias("bands"),
        )
    )


def run_incremental_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: MinHashConfig,
    curate: bool = False,
    license_allow: list[str] | None = None,
) -> None:
    """Append-only signature ingest; availableNow drains the backlog and
    stops (cron-style incremental batch — the common production shape)."""
    q = (
        signature_stream(spark, input_dir, cfg, curate=curate,
                         license_allow=license_allow)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: MinHashConfig,
    maintain_clusters: bool = False,
    curate: bool = False,
    license_allow: list[str] | None = None,
) -> None:
    """Incremental near-dup detection: per micro-batch, new docs' band keys
    join the accumulated bucket table; candidate pairs (new x history plus
    new x new) are verified exactly and appended to the edges table.

    State tables under ``state_dir``: signatures/ (append), edges/ (append),
    and — with ``maintain_clusters`` — clusters/ (overwritten per batch with
    the connected components of ALL accumulated edges, so a cross-batch
    chain a-b, b-c merges into one cluster as soon as the closing edge
    lands). The edge set is orders of magnitude smaller than the corpus, so
    recomputing CC per batch is the cheap, always-consistent choice (the
    same rationale as the batch pipeline's driver union-find fast path); at
    extreme edge cardinalities swap in an incremental CC that only touches
    components adjacent to the batch's new edges.
    """
    sig_dir = os.path.join(state_dir, "signatures")
    edges_dir = os.path.join(state_dir, "edges")
    clusters_dir = os.path.join(state_dir, "clusters")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.transform(barrier)
        if batch_df.isEmpty():
            return
        new_sigs = batch_df.select(
            F.col("file_id").alias("rep_id"), "content", "content_sha256", "sig", "bands"
        )
        # history = previously committed batches ONLY. Two deliberate choices:
        # (a) Hadoop-FS existence probe instead of a bare except — a transient
        #     read error must FAIL the batch (swallowing it would verify new
        #     docs only against each other and permanently lose
        #     new-vs-history edges once the batch commits), and the probe
        #     works for remote state roots (HDFS/S3), not just local paths;
        # (b) exclude THIS batch_id — foreachBatch is at-least-once, and on
        #     replay the crashed attempt's own partition is already on disk;
        #     including it duplicates every rep_id in `union` and fans out
        #     the verify joins.
        hist = None
        if _history_partitions_exist(spark, sig_dir):
            hist = (
                spark.read.parquet(sig_dir)
                .where(F.col("batch_id") != batch_id)
                .select("rep_id", "content", "sig", "bands")
            )
        union = new_sigs.select("rep_id", "content", "sig", "bands").withColumn(
            "is_new", F.lit(True)
        )
        if hist is not None:
            union = union.unionByName(hist.withColumn("is_new", F.lit(False)))
        new_buckets = new_sigs.select("rep_id", F.explode("bands").alias("band_hash"))
        all_buckets = union.select(
            "rep_id", "is_new", F.explode("bands").alias("band_hash")
        )
        # skew control, same policy as the batch path (lsh.candidate_pairs):
        # a boilerplate band accumulating m history members would otherwise
        # emit m pairs per new doc per batch — O(m^2) cumulative. The shared
        # operator caps oversized buckets with HISTORY-ANCHORED star edges
        # (rationale + anchor-correctness argument in its docstring).
        cand = lsh.incremental_candidate_pairs(
            new_buckets, all_buckets, cfg.max_bucket_size
        )
        sigs_only = union.select("rep_id", "sig")
        contents = union.select("rep_id", "content")
        edges = verify.verify_pairs(cand, sigs_only, contents, cfg)
        # foreachBatch is at-least-once: write per-batch_id subdirectories in
        # overwrite mode so a replayed batch rewrites (not duplicates) its own
        # slice of state, making the commit idempotent.
        edges.write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch_id={batch_id}")
        )
        # content is retained in state so later batches can exact-verify
        # new-vs-history candidates (at scale: swap for a pointer back into
        # the source table and join on demand)
        new_sigs.write.mode("overwrite").parquet(
            os.path.join(sig_dir, f"batch_id={batch_id}")
        )
        if maintain_clusters:
            from minhash_spark.operators import components

            all_edges = spark.read.parquet(edges_dir).select(
                F.col("a_id").alias("u"), F.col("b_id").alias("v")
            )
            all_ids = spark.read.parquet(sig_dir).select(F.col("rep_id").alias("node"))
            comp = components.connected_components(all_edges)
            clustered = all_ids.join(comp, "node", "left").select(
                F.col("node").alias("rep_id"),
                F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
            )
            # full overwrite of a DERIVED table (rebuilt from edges+signatures
            # every batch) through Spark's writer: works on any filesystem
            # (no local-only rename), idempotent on replay, and a crash
            # mid-write just leaves the table to be rebuilt next batch —
            # nothing irrecoverable is lost. localCheckpoint first: Spark
            # cannot overwrite a path that feeds the plan being written, and
            # the plan reads sig_dir (also being appended this batch).
            clustered.transform(barrier).write.mode("overwrite").parquet(clusters_dir)

    q = (
        signature_stream(spark, input_dir, cfg, curate=curate,
                         license_allow=license_allow)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
