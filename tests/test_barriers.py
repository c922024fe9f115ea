"""Reliable-checkpoint opt-in (verify.barrier): the documented
preemption-heavy-cluster knob must produce the exact same edges as the
default localCheckpoint path — same plan, different block durability."""

from __future__ import annotations

from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import minhash_struct_udf
from minhash_spark.operators import lsh, verify


def _edges(spark, docs):
    cfg = MinHashConfig(
        seed=0,
        size=128,
        bit=1,
        tokenizer="word_shingle",
        tokenizer_params={"n": 3},
        num_bands=32,
        rows_per_band=4,
        verify_threshold=0.8,
    )
    sig = minhash_struct_udf(cfg)
    sigs = docs.select(
        F.col("doc_id").cast("string").alias("rep_id"), sig(F.col("text")).alias("s")
    ).select("rep_id", F.col("s.sig").alias("sig"), F.col("s.bands").alias("bands"))
    pairs, _ = lsh.candidate_pairs(lsh.explode_buckets(sigs), cfg.max_bucket_size)
    contents = docs.select(
        F.col("doc_id").cast("string").alias("rep_id"), F.col("text").alias("content")
    )
    out = verify.verify_pairs(pairs, sigs, contents, cfg)
    return sorted(
        (r["a_id"], r["b_id"], round(r["jaccard"], 9)) for r in out.collect()
    )


def test_reliable_barriers_match_local(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog while the engine "
        "shuffles bounded partitions across the cluster nodes tonight "
    )
    docs = spark.createDataFrame(
        [(i, base * 2 + f"tail{i % 3}") for i in range(30)]
        + [(100, "a lone unrelated document with entirely different words here")],
        "doc_id long, text string",
    )
    default_edges = _edges(spark, docs)
    assert default_edges, "planted corpus must produce edges"
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(verify.RELIABLE_BARRIERS_CONF, "true")
    try:
        reliable_edges = _edges(spark, docs)
    finally:
        spark.conf.set(verify.RELIABLE_BARRIERS_CONF, "false")
    assert reliable_edges == default_edges
