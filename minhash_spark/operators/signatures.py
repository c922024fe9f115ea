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


def distinct_contents(files_with_id: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """One representative row per distinct content (P3 exact-dup shortcut).

    min(file_id) keeps the representative deterministic. The aggregation
    shuffles (content_sha256, content) once; everything downstream (kernel,
    LSH, verify) runs on representatives only.

    ``num_partitions``: when set, an explicit hash repartition on
    content_sha256 is planned UNDER the aggregate. EnsureRequirements then
    satisfies the groupBy's distribution from that exchange (same key, same
    partition count), so the aggregate adds NO second exchange — and because
    the partition count is user-pinned, AQE cannot coalesce it down to a
    few IO-sized partitions that would starve a CPU-bound kernel UDF placed
    directly on top. One content shuffle total, already spread for the
    kernel (guide §2.4: two operations keyed the same way share one
    exchange)."""
    if num_partitions:
        files_with_id = files_with_id.repartition(num_partitions, "content_sha256")
    return files_with_id.groupBy("content_sha256").agg(
        F.min("file_id").alias("rep_id"), F.first("content").alias("content")
    )


def rep_id_set(files_with_id: DataFrame) -> DataFrame:
    """The exact-dup representative DECISION on metadata only: one
    ``rep_id`` (= min file_id) per distinct content_sha256.

    Shuffles (content_sha256, file_id) — ~130 B/row — instead of the
    multi-KB content column: the decision of which rows survive P3 never
    needed the payload (guide §8: decide with small rows)."""
    return (
        files_with_id.select("content_sha256", "file_id")
        .groupBy("content_sha256")
        .agg(F.min("file_id").alias("rep_id"))
        .select("rep_id")
    )


def representatives_by_id(files_with_id: DataFrame, rep_set: DataFrame) -> DataFrame:
    """Attach the rep decision back to the scan WITHOUT moving content: a
    broadcast join on file_id keeps exactly the representative rows where
    they were read, so the kernel runs fused into the scan and content
    never crosses an exchange (guide §8 'broadcast the plan' — the
    replaced shape shuffled every content byte under the dedup groupBy).

    Precondition: file_id is unique per row (it is the row identity —
    sha256 of (repo, path, commit)). Caller guards the broadcast size;
    above the threshold the content-shuffle path (distinct_contents) is
    the correct fallback."""
    return files_with_id.join(
        F.broadcast(rep_set), files_with_id["file_id"] == rep_set["rep_id"]
    ).select("content_sha256", "rep_id", "content")


def compute_signatures(
    reps: DataFrame, cfg: MinHashConfig, exclude_sorted=None, spread: bool = True
) -> DataFrame:
    """representatives -> (content_sha256, rep_id, sig, sig_b64, bands).

    Narrow map stage; the only process boundary is the Arrow batch transfer
    into the kernel UDF."""
    sig = minhash_struct_udf(cfg, exclude_sorted=exclude_sorted)
    # AQE coalesces the distinct-contents shuffle to few IO-sized partitions,
    # which would starve the CPU-bound kernel UDF; spread it back out —
    # unless the caller already partitioned reps wide (``spread=False``,
    # the pipeline's distinct_contents(num_partitions=...) path), in which
    # case a second full shuffle of content would be pure waste.
    if spread:
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
