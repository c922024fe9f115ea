"""Unit tests: connected components (star alternation) and TableIO."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from minhash_spark.operators.components import connected_components
from minhash_spark.sources.io import TableIO


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["u", "v"])
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_two_triangles(spark):
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_long_chain(spark):
    # path graph of 40 nodes: worst case for naive propagation; the star
    # alternation must converge in O(log n) rounds
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cc_string_ids(spark):
    got = _cc(spark, [("b", "a"), ("c", "b"), ("x", "z")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "z": "x"}


def test_cc_self_loop_and_dup_edges(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_cc_distributed_path_matches_driver_path(spark):
    # driver_threshold=0 forces the star-contraction path (the 10^12-row
    # route); results must be identical to the driver union-find fast path
    cases = [
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)],
        [(i, i + 1) for i in range(40)],
        [("b", "a"), ("c", "b"), ("x", "z")],
    ]
    for edges in cases:
        assert _cc(spark, edges, driver_threshold=0) == _cc(spark, edges)


def test_tableio_write_read_manifest(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    m = io.write(df, "t1", "cfg123", [])
    assert m["rows"] == 10
    assert io.manifest("t1")["config_hash"] == "cfg123"
    assert io.read(spark, "t1").count() == 10
    assert io.is_fresh("t1", "cfg123", [])
    assert not io.is_fresh("t1", "other", [])

    # downstream freshness is keyed on upstream snapshot ids
    io.write(df, "t2", "cfg123", ["t1"])
    assert io.is_fresh("t2", "cfg123", ["t1"])
    io.write(df, "t1", "cfg123", [])  # republish upstream -> new snapshot
    assert not io.is_fresh("t2", "cfg123", ["t1"])


def test_tableio_input_fingerprint_gates_resume(spark, tmp_path):
    from minhash_spark.sources.io import input_fingerprint

    io = TableIO(str(tmp_path / "ckpt"))
    src = str(tmp_path / "in")
    spark.range(10).write.parquet(src)
    files = spark.read.parquet(src)
    fp1 = input_fingerprint(files)
    assert fp1 is not None
    io.write(files, "sig", "cfg", [], input_fp=fp1)
    assert io.is_fresh("sig", "cfg", [], input_fp=fp1)

    # input dataset changes (new file appended) -> fingerprint differs -> stale
    spark.range(5).write.mode("append").parquet(src)
    fp2 = input_fingerprint(spark.read.parquet(src))
    assert fp2 != fp1
    assert not io.is_fresh("sig", "cfg", [], input_fp=fp2)

    # in-memory frames have no fingerprint; None matches None (legacy behavior)
    assert input_fingerprint(spark.range(3)) is None


def test_tableio_atomic_publish_no_tmp_left(spark, tmp_path):
    io = TableIO(str(tmp_path))
    io.write(spark.range(3), "t", "c", [])
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []
    # manifest is valid JSON inside the table dir
    with open(os.path.join(str(tmp_path), "t", "_manifest.json")) as f:
        assert json.load(f)["rows"] == 3


def test_tableio_manifest_per_partition_lineage(spark, tmp_path):
    from minhash_spark.sources.io import TableIO

    io = TableIO(str(tmp_path / "ckpt"))
    df = spark.range(1000).withColumn("k", (F.col("id") % 7).cast("int")).repartition(4)
    m = io.write(df, "t", config_hash="abc")
    parts = m["partitions"]
    stats = m["partition_stats"]
    assert stats["n_files"] == len(parts) > 1
    assert sum(p["rows"] for p in parts) == m["rows"] == 1000
    assert all(p["bytes"] > 0 and p["file"].endswith(".parquet") for p in parts)
    assert stats["min_rows"] <= stats["mean_rows"] <= stats["max_rows"]
    assert stats["skew_max_over_mean"] >= 1.0
    assert stats["detail_truncated"] is False


def test_package_public_api_lazy_exports():
    import minhash_spark as m

    assert m.MinHashConfig(seed=0, size=128, bit=1).config_hash()
    assert callable(m.build_session) and callable(m.search_signatures)
    assert callable(m.signature_for_text) and callable(m.DedupPipeline)
    try:
        m.not_a_thing
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass


def test_training_shards_deterministic_and_balanced(spark, tmp_path):
    from minhash_spark.sources.shards import write_training_shards

    df = spark.range(2000).withColumn("doc_id", F.col("id")).withColumn(
        "text", F.concat(F.lit("doc "), F.col("id"))
    ).drop("id")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(df, p1, n_shards=8)
    m2 = write_training_shards(df.repartition(13), p2, n_shards=8)  # different input partitioning
    assert m1["rows"] == 2000 and len(m1["shards"]) == 8
    assert m1["balance"]["skew_max_over_mean"] < 1.3  # hash-balanced
    # membership is a pure function of doc_id: identical across runs/partitionings
    a = {r["doc_id"]: r["shard"] for r in spark.read.parquet(p1).select("doc_id", "shard").collect()}
    b = {r["doc_id"]: r["shard"] for r in spark.read.parquet(p2).select("doc_id", "shard").collect()}
    assert a == b and len(a) == 2000
    # every row lands in exactly one shard
    assert sum(s["rows"] for s in m1["shards"]) == 2000


def test_signature_hash_ignores_verify_knobs():
    """signature_hash must be invariant to pair-acceptance knobs (an index
    stays searchable across them) but sensitive to anything that changes the
    stored bytes or band keys."""
    import dataclasses

    from minhash_spark.config import MinHashConfig

    a = MinHashConfig(seed=0, size=128, bit=1, tokenizer="char_shingle",
                      tokenizer_params={"k": 9})
    b = dataclasses.replace(a, verify_threshold=0.5, max_bucket_size=16,
                            containment_threshold=0.9, substring_verify=True)
    assert a.signature_hash() == b.signature_hash()
    assert a.config_hash() != b.config_hash()
    for change in ({"seed": 7}, {"size": 64}, {"bit": 2}, {"scheme": "oph"},
                   {"tokenizer": "word"}, {"num_bands": 16, "rows_per_band": 8}):
        c = dataclasses.replace(a, **change)
        assert a.signature_hash() != c.signature_hash(), change
