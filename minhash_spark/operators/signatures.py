"""Stage P2-P3: file identity, content sha256, exact-dup shortcut, signatures.

Re-expresses the reference's ingest path (parse -> analyze -> encode -> write,
MinHashFieldMapper.java:252-295) as one narrow Spark stage, with an exact-dup
shortcut the reference enables via its keyword field (term query on equal
signatures, MinHashPluginTest.java collapse semantics) but that we hoist
BEFORE the kernel: only one representative per distinct content is ever
tokenized/hashed — on real corpora with 2-10x exact-dup factors this removes
most kernel work and most LSH input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import file_id_col, minhash_struct_udf


def with_identity(files: DataFrame) -> DataFrame:
    """Add file_id (row identity) and content_sha256 (per-row invariant that
    must survive to the final cluster table — BASELINE.json input_hint)."""
    return files.withColumn("file_id", file_id_col()).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )


def distinct_contents(files_with_id: DataFrame) -> DataFrame:
    """One representative row per distinct content (P3 exact-dup shortcut).

    min(file_id) keeps the representative deterministic. The aggregation
    shuffles (content_sha256, content) once; everything downstream (kernel,
    LSH, verify) runs on representatives only.
    """
    return files_with_id.groupBy("content_sha256").agg(
        F.min("file_id").alias("rep_id"), F.first("content").alias("content")
    )


def compute_signatures(reps: DataFrame, cfg: MinHashConfig, exclude_sorted=None) -> DataFrame:
    """representatives -> (content_sha256, rep_id, sig, sig_b64, bands).

    Narrow map stage; the only process boundary is the Arrow batch transfer
    into the kernel UDF."""
    sig = minhash_struct_udf(cfg, exclude_sorted=exclude_sorted)
    # AQE coalesces the distinct-contents shuffle to few IO-sized partitions,
    # which would starve the CPU-bound kernel UDF; spread it back out.
    par = reps.sparkSession.sparkContext.defaultParallelism
    reps = reps.repartition(par)
    return reps.select(
        "content_sha256",
        "rep_id",
        "content",
        sig(F.col("content")).alias("s"),
    ).select(
        "content_sha256",
        "rep_id",
        F.col("s.sig").alias("sig"),
        F.col("s.sig_b64").alias("sig_b64"),
        F.col("s.bands").alias("bands"),
    )
