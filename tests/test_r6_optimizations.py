"""Round-6 optimization equivalence pins: each restructured operator must
produce byte/row-identical output to the shape it replaced.

1. signatures.representatives_by_id (metadata rep decision + broadcast
   attach — zero content exchanges) == distinct_contents (content-shuffle
   groupBy), including exact-dup collapse and NULL-content rows.
2. queries._pair_cosine_udf (broadcast-matrix einsum over bare id pairs)
   == the cosine_col array-join path, to the emitted 4-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minhash_spark.operators import signatures


def _planted_files(spark):
    rows = [
        # two exact dups of one content + a singleton + a NULL-content row
        ("r1", "a.py", "c1", "py", "shared content body"),
        ("r2", "b.py", "c2", "py", "shared content body"),
        ("r1", "c.py", "c3", "py", "unique content body"),
        ("r3", "d.py", "c4", "py", None),
        ("r3", "e.py", "c5", "py", None),
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_representatives_by_id_matches_distinct_contents(spark):
    files = _planted_files(spark)
    with_id = signatures.with_identity(files)
    a = signatures.distinct_contents(with_id, num_partitions=4)
    b = signatures.representatives_by_id(with_id, signatures.rep_id_set(with_id))
    # same rows, both directions (rep_id = min(file_id) per distinct sha,
    # one row per distinct content incl. the NULL-sha group)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert b.count() == 3  # 2 distinct contents + the NULL-content group


def test_pair_cosine_matrix_matches_join_path(spark):
    import numpy as np

    from minhash_spark.functions.embeddings import cosine_col
    from minhash_spark.plans import queries as Q

    rng = np.random.default_rng(7)
    vecs = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pairs = (
        emb.select(F.col("vec_id").alias("a_id"))
        .crossJoin(emb.select(F.col("vec_id").alias("b_id")))
        .where(F.col("a_id") < F.col("b_id"))
    )
    join_path = (
        pairs.join(emb.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va")), "a_id")
        .join(emb.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb")), "b_id")
        .select("a_id", "b_id", F.round(cosine_col(F.col("va"), F.col("vb")), 4).alias("cos_sim"))
    )
    matrix_path = pairs.select(
        "a_id", "b_id",
        F.round(Q._pair_cosine_udf(spark, emb)(F.col("a_id"), F.col("b_id")), 4).alias("cos_sim"),
    )
    assert join_path.exceptAll(matrix_path).count() == 0
    assert matrix_path.exceptAll(join_path).count() == 0


def test_duplicate_rows_fall_back_to_the_collapsing_path(spark, tmp_path):
    """The broadcast-rep path's documented precondition — files unique by
    (repo, path, commit) — is a CONTRACT, not a runtime check (validating
    it costs a corpus metadata aggregate per run). Callers with dirty
    input pass assume_unique_rows=False: the pipeline then takes the
    content-shuffle groupBy, which collapses duplicate rows exactly like
    r5 did, and the final cluster table matches a run over the
    de-duplicated input."""
    from minhash_spark.config import MinHashConfig
    from minhash_spark.plans.pipeline import DedupPipeline
    from minhash_spark.sources.io import TableIO

    cfg = MinHashConfig(
        seed=0, size=128, bit=1, scheme="kseed",
        tokenizer="char_shingle", tokenizer_params={"k": 9},
        verify_threshold=0.8,
    )
    rows = [
        ("r1", "a.py", "c1", "py", "alpha content body " * 4),
        ("r1", "a.py", "c1", "py", "alpha content body " * 4),  # exact dup ROW
        ("r2", "b.py", "c2", "py", "beta content body " * 4),
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    dirty = spark.createDataFrame(rows, schema)
    clean = dirty.dropDuplicates(["repo", "path", "commit"])

    out_dirty = DedupPipeline(
        spark, TableIO(str(tmp_path / "dirty")), cfg, assume_unique_rows=False
    ).run(dirty, input_fp="dirty")
    out_clean = DedupPipeline(
        spark, TableIO(str(tmp_path / "clean")), cfg
    ).run(clean, input_fp="clean")

    # duplicate input rows still appear in clusters_all (per-row identity),
    # but exactly once per DISTINCT row identity in the signature/cluster
    # tables: the per-file (file_id -> cluster) assignment matches the
    # clean run's
    a = {(r["file_id"], r["cluster_id"]) for r in out_dirty.collect()}
    b = {(r["file_id"], r["cluster_id"]) for r in out_clean.collect()}
    assert a == b
    sigs = spark.read.parquet(str(tmp_path / "dirty" / "signatures"))
    assert sigs.count() == sigs.select("content_sha256").distinct().count()


def test_stray_correctness_file_does_not_break_queries(tmp_path, monkeypatch):
    """CORRECTNESS_r*.json glob hits with no round digits (editor backups,
    CORRECTNESS_rerun.json) must be skipped, not crash the driver window
    rotation at queries() time."""
    import shutil
    from pathlib import Path

    import __spark_entry__ as entry

    root = Path(entry.__file__).parent
    stray = root / "CORRECTNESS_rerun.json"
    assert not stray.exists()
    try:
        stray.write_text("{}")
        q = entry.queries()
        assert len(q) >= 92
    finally:
        stray.unlink()


def test_novelty_hashed_spans_match_string_spans(spark):
    """The production novelty shape (xxhash64 the 13-gram before the
    corpus-span shuffle) must emit the identical (doc_id, n_spans,
    n_novel, novelty) table as the oracle-comparable string mode on real
    data (collisions are the only divergence mechanism, ~n^2/2^65)."""
    from minhash_spark.plans import queries as Q

    docs = Q.load(spark, "/root/testdata/sf0.001", "documents")
    a = Q.novelty_scores_frame(docs, spans_hashed=False)
    b = Q.novelty_scores_frame(docs, spans_hashed=True)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_surface_encodings_from_cached_bytes_match_direct_udfs(spark):
    """q_minhash_signatures / q_minhash_bitstrings now re-encode the
    session-cached signature BYTES instead of re-running the kernel over
    text; the emitted strings must be byte-identical to the direct
    text->string UDFs on real data (incl. the BitSet truncation rows)."""
    from pyspark.sql import functions as F2

    from minhash_spark.functions.udfs import minhash_b64_udf, minhash_bitstring_udf
    from minhash_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    docs = Q.load(spark, sf, "documents").select("doc_id", "text")
    direct_b64 = docs.select("doc_id", minhash_b64_udf(Q.DOC_CFG)(F2.col("text")).alias("sig_b64"))
    cached_b64 = Q.q_minhash_signatures(spark, sf)
    assert direct_b64.exceptAll(cached_b64).count() == 0
    assert cached_b64.exceptAll(direct_b64).count() == 0

    direct_bits = docs.select(
        "doc_id", minhash_bitstring_udf(Q.DOC_CFG)(F2.col("text")).alias("sig_bits")
    ).select("doc_id", "sig_bits", F2.length("sig_bits").cast("long").alias("n_bits"))
    cached_bits = Q.q_minhash_bitstrings(spark, sf)
    assert direct_bits.exceptAll(cached_bits).count() == 0
    assert cached_bits.exceptAll(direct_bits).count() == 0
