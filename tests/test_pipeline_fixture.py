"""E2E on corpus A (the reference's golden corpus, MinHashPluginTest.java:152-170):
golden signature equality through the Spark UDF, exact cluster recovery
(100 clusters x 10 copies -> recall 1.0), per-row sha256 invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minhash_spark.config import REFERENCE_CONFIGS, MinHashConfig
from minhash_spark.functions.udfs import minhash_b64_udf, minhash_bitstring_udf
from minhash_spark.plans.pipeline import DedupPipeline
from minhash_spark.sources.fixtures import corpus_a
from minhash_spark.sources.io import TableIO

GOLDEN = {
    # content -> (analyzer1, analyzer2, analyzer3) base64, MinHashPluginTest.java:163-170
    "test 1": ("Uji99jenq7da3aNKTYc8yQ==", "fUkN7K0iiMHp1MxiGXnIaw==", "W51pEPuK8tw="),
    "test 2": ("AGB9/Yen+yf/lBvJKtMdQA==", "8ShNb6UVCgPh16yxOd2Lew==", "i11gJHsY/zw="),
}


@pytest.fixture(scope="module")
def files_a(spark):
    return spark.createDataFrame(corpus_a()).cache()


def test_golden_signatures_through_spark(spark, files_a):
    cfgs = [REFERENCE_CONFIGS["analyzer1"], REFERENCE_CONFIGS["analyzer2"], REFERENCE_CONFIGS["analyzer3"]]
    df = files_a.where(F.col("content").isin(*GOLDEN))
    for i, cfg in enumerate(cfgs):
        got = {
            r["content"]: r["b64"]
            for r in df.select("content", minhash_b64_udf(cfg)(F.col("content")).alias("b64"))
            .distinct()
            .collect()
        }
        for content, expected in GOLDEN.items():
            assert got[content] == expected[i], (cfg, content)


def test_multi_config_fanout_matches_golden(spark, files_a):
    """copy_to analog: ONE UDF pass produces all three analyzer signatures
    (MinHashPluginTest.java:106-113) and each matches its golden vector."""
    from minhash_spark.functions.udfs import multi_config_struct_udf

    udf = multi_config_struct_udf(
        {k: REFERENCE_CONFIGS[k] for k in ("analyzer1", "analyzer2", "analyzer3")}
    )
    rows = (
        files_a.where(F.col("content").isin(*GOLDEN))
        .select("content", udf(F.col("content")).alias("m"))
        .distinct()
        .collect()
    )
    assert len(rows) == 2
    for r in rows:
        exp = GOLDEN[r["content"]]
        assert r["m"]["analyzer1"]["sig_b64"] == exp[0]
        assert r["m"]["analyzer2"]["sig_b64"] == exp[1]
        assert r["m"]["analyzer3"]["sig_b64"] == exp[2]
        # null handling: struct fields None for null content is covered by
        # the single-config surface tests; bands present here
        assert len(r["m"]["analyzer3"]["bands"]) == REFERENCE_CONFIGS["analyzer3"].num_bands


def test_identical_content_identical_signature_all_docs(spark, files_a):
    # docs i and i+100 share content => identical signatures (doc 101 ≡ doc 1)
    cfg = REFERENCE_CONFIGS["analyzer3"]
    n = (
        files_a.select("content", minhash_b64_udf(cfg)(F.col("content")).alias("b64"))
        .groupBy("content")
        .agg(F.countDistinct("b64").alias("d"))
        .where(F.col("d") != 1)
        .count()
    )
    assert n == 0


def test_bit_string_surface(spark, files_a):
    # my_minhash_value3 field uses bit_string:true (MinHashPluginTest.java:137-141)
    cfg = REFERENCE_CONFIGS["analyzer1"]
    row = (
        files_a.where(F.col("content") == "test 1")
        .select(minhash_bitstring_udf(cfg)(F.col("content")).alias("bs"))
        .first()
    )
    import base64

    expected_bytes = base64.b64decode(GOLDEN["test 1"][0])
    assert row["bs"] == "".join(format(b, "08b") for b in expected_bytes)


def test_pipeline_recovers_ground_truth_clusters(spark, files_a, tmp_path):
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word", verify_threshold=0.9)
    io = TableIO(str(tmp_path / "ckpt"))
    pipe = DedupPipeline(spark, io, cfg)
    out = pipe.run(files_a).cache()

    # 1000 files, 100 clusters of exactly 10
    assert out.count() == 1000
    sizes = (
        out.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {(r["sz"], r["n"]) for r in sizes} == {(10, 100)}

    # dup-pair recall vs ground truth == 1.0 (>= 0.99 target)
    clusters = {r["file_id"]: r["cluster_id"] for r in out.collect()}
    ids_by_content = {}
    from minhash_spark.sources.fixtures import file_id

    for i in range(1, 1001):
        ids_by_content.setdefault(i % 100, []).append(
            file_id("fixture/es-minhash", f"doc/{i}.txt", "0" * 40)
        )
    hit = total = 0
    for members in ids_by_content.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                hit += clusters[members[i]] == clusters[members[j]]
    assert total == 4500
    assert hit / total == 1.0

    # no cross-content merges: distinct contents stay in distinct clusters
    assert out.select("cluster_id").distinct().count() == 100

    # per-row invariant: content_sha256 equals recomputation from source
    src = files_a.withColumn(
        "fid", F.sha2(F.concat_ws("", "repo", "path", "commit"), 256)
    ).withColumn("sha_src", F.sha2(F.col("content"), 256))
    mismatches = (
        out.join(src.select(F.col("fid").alias("file_id"), "sha_src"), "file_id")
        .where(F.col("content_sha256") != F.col("sha_src"))
        .count()
    )
    assert mismatches == 0


def test_pipeline_resume_skips_fresh_stages(spark, files_a, tmp_path):
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word", verify_threshold=0.9)
    io = TableIO(str(tmp_path / "ckpt2"))
    p1 = DedupPipeline(spark, io, cfg)
    out1 = p1.run(files_a)
    c1 = sorted((r["file_id"], r["cluster_id"]) for r in out1.collect())
    assert all(not s.skipped for s in p1.stages)

    # kill downstream: drop edges + clusters, keep signatures
    io.drop(DedupPipeline.T_EDGES)
    io.drop(DedupPipeline.T_CLUSTERS)
    io.drop(DedupPipeline.T_CLUSTERS_ALL)
    p2 = DedupPipeline(spark, io, cfg)
    out2 = p2.run(files_a)
    skipped = {s.name: s.skipped for s in p2.stages}
    assert skipped[DedupPipeline.T_SIG]
    assert not skipped[DedupPipeline.T_EDGES]
    c2 = sorted((r["file_id"], r["cluster_id"]) for r in out2.collect())
    assert c1 == c2

    # config change invalidates everything
    cfg3 = MinHashConfig(seed=7, size=128, bit=1, tokenizer="word", verify_threshold=0.9)
    p3 = DedupPipeline(spark, io, cfg3)
    p3.run(files_a)
    assert all(not s.skipped for s in p3.stages)


def test_pipeline_empty_and_single_input(spark, tmp_path):
    """Degenerate inputs must produce valid (empty / singleton) stage tables,
    not crash — the first thing a backfill over a sparse partition hits."""
    import minhash_spark as m

    cfg = m.MinHashConfig(seed=0, size=128, bit=1, tokenizer="char_shingle",
                          tokenizer_params={"k": 9})
    schema = "repo string, path string, commit string, lang string, content string"
    empty = spark.createDataFrame([], schema)
    out = m.DedupPipeline(spark, m.TableIO(str(tmp_path / "e")), cfg).run(empty)
    assert out.count() == 0

    one = spark.createDataFrame([("r", "p", "c", "py", "just one file here")], schema)
    out1 = m.DedupPipeline(spark, m.TableIO(str(tmp_path / "s")), cfg).run(one)
    rows = out1.collect()
    assert len(rows) == 1 and rows[0]["cluster_id"] is not None


def test_report_stage_summaries(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))
    import report as report_mod

    import minhash_spark as m

    cfg = m.MinHashConfig(seed=0, size=128, bit=1, tokenizer="char_shingle",
                          tokenizer_params={"k": 9})
    schema = "repo string, path string, commit string, lang string, content string"
    files = spark.createDataFrame(
        [("r", f"p{i}", "c", "py", f"content of file number {i} with words") for i in range(10)],
        schema,
    )
    io = m.TableIO(str(tmp_path / "ck"))
    m.DedupPipeline(spark, io, cfg).run(files)
    stages = report_mod.stage_summaries(io)
    names = [s["stage"] for s in stages]
    assert names == ["signatures", "edges", "clusters", "clusters_all"]
    assert all("partition_stats" in s and s["rows"] >= 0 for s in stages)
    assert stages[-1]["rows"] == 10
