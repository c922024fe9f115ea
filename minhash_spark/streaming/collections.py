"""Structured Streaming: repo-signature maintenance via the MinHash monoid.

X78 (the streaming face of X74): a daily crawl keeps repo/collection-level
MinHash sketches current WITHOUT ever revisiting history. The union monoid
(MinHash(A ∪ B) = elementwise min — operators/repo.py) makes the state
update a pure fold:

    state[repo] <- elementwise_min(state[repo], merge(batch files of repo))

Two properties fall out of the algebra and are what make this safe to run
forever on a stream:

  * O(delta): each micro-batch touches only its own files plus the <= |repos
    in batch| state rows it merges into — history content is never re-read,
    never re-hashed (pinned: tests/test_repo_dedup.py incremental == full).
  * Idempotent replay: foreachBatch is at-least-once; min is idempotent
    (min(x, x) = x), so a replayed batch folded into already-updated state
    changes NOTHING — the state table needs no dedup ledger, no batch_id
    exclusion dance (contrast incremental.py's edge tables, which need
    per-batch_id overwrite partitions precisely because append is NOT
    idempotent). Pinned by test_streaming.py::test_repo_state_replay.

Deletions/rewrites are the monoid's known limit: min-folds only grow set
membership. A repo that deletes a file keeps its old minima until the next
full rebuild — the same compaction cadence any sketch-of-union system runs
(document retired => rebuild from the live file set, X62's snapshot diff
tells you which repos need it).

State layout: ``state_dir/repo_sigs/`` — one parquet table (repo, mins)
overwritten per batch through a barrier (the plan reads the same
path it overwrites; localCheckpoint cuts the lineage first, the exact move
embeddings.py::clusters uses). Overwrite-whole-table is right at this
cardinality: the state is one row of 128 longs PER REPO (10^8 repos ≈ 100 GB
— a partitioned overwrite, still no content re-hash); per-repo upsert sinks
(Delta/Iceberg MERGE) drop in where available, keyed on repo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urllib.parse import urlparse

from minhash_spark.config import MinHashConfig
from minhash_spark.operators.repo import merge_minima
from minhash_spark.operators.verify import barrier
from minhash_spark.streaming.incremental import FILES_SCHEMA


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "repo_sigs")


def _state_exists(spark: SparkSession, path: str) -> bool:
    """Loud-fail existence probe (same contract as incremental.py's history
    probe): path-not-found is the ONLY condition treated as "no state"; any
    other error propagates and fails the batch, because silently treating a
    flaky read as absent state would RESET every repo sketch to this batch's
    delta — an unrecoverable corruption, not a retry."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:
        scheme = urlparse(path).scheme
        if scheme not in ("", "file"):
            raise RuntimeError(
                "state probe needs a JVM gateway for non-local state_dir "
                f"scheme {scheme!r} (Spark Connect session?)"
            )
        local = urlparse(path).path if scheme == "file" else path
        return os.path.isdir(local) and bool(os.listdir(local))
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def repo_signatures(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (repo, mins array<long>) state."""
    return spark.read.parquet(_state_path(state_dir))


def update_repo_state(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    cfg: MinHashConfig,
) -> None:
    """Fold one micro-batch of (repo, ..., content) into the repo-sketch
    state. Pure monoid fold — callable directly (tests, backfills) or from
    foreachBatch; safe under at-least-once replay by idempotence of min."""
    from minhash_spark.functions.udfs import minhash_mins_udf

    mins = minhash_mins_udf(cfg)
    per_file = batch_df.select("repo", mins(F.col("content")).alias("mins"))
    delta = merge_minima(per_file, "repo")
    path = _state_path(state_dir)
    if _state_exists(spark, path):
        prev = spark.read.parquet(path)
        merged = merge_minima(prev.unionByName(delta), "repo")
    else:
        merged = delta
    # barrier before overwrite: the plan reads the path it replaces
    merged.transform(barrier).write.mode("overwrite").parquet(path)


def run_repo_signature_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: MinHashConfig,
) -> None:
    """availableNow ingest: drain the landing dir, fold each micro-batch of
    files into the per-repo sketch state, exit. Re-run on the next drop —
    the streaming checkpoint skips already-committed files."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.transform(barrier)
        if batch_df.isEmpty():
            return
        update_repo_state(spark, batch_df, state_dir, cfg)

    q = (
        spark.readStream.schema(FILES_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
