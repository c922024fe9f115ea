"""Star-cap coverage for the non-MinHash candidate self-joins (VERDICT r2
items 3-4): a dense/degenerate bucket must emit O(n) star candidates, not
O(n^2) — planted corpora drive the embedding and simhash query paths through
oversized buckets and assert the linear shape, plus the key-generic
``lsh.candidate_pairs`` contract directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minhash_spark.operators import lsh
from minhash_spark.plans import queries as Q


def test_candidate_pairs_generic_columns_star_cap(spark):
    # one oversized bucket (ids 0..99 under key 7) + one small (200,201 under 8)
    rows = [(7, i) for i in range(100)] + [(8, 200), (8, 201)]
    buckets = spark.createDataFrame(rows, "bucket long, vec_id long")
    pairs, overflow = lsh.candidate_pairs(
        buckets, max_bucket_size=10, key_col="bucket", id_col="vec_id"
    )
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # star: every member of the big bucket pairs with its min id only
    assert {(0, i) for i in range(1, 100)} <= got
    assert (200, 201) in got
    assert len(got) == 99 + 1  # O(n), not 100*99/2
    over = overflow.collect()
    assert len(over) == 1 and over[0]["bucket"] == 7 and over[0]["bucket_size"] == 100


def _write_identical_docs(spark, path: str, n: int):
    text = "lorem ipsum dolor sit amet consectetur adipiscing elit today"
    spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    ).write.parquet(f"{path}/documents.parquet")


def test_simhash_pairs_degenerate_bucket_is_linear(spark, tmp_path, monkeypatch):
    """60 identical docs share one simhash -> all four band values collide.
    Uncapped that is one quadratic bucket (1770 pairs); with the star cap the
    same corpus yields exactly n-1 verified pairs through the min-id center."""
    p = str(tmp_path / "sim")
    _write_identical_docs(spark, p, 60)
    monkeypatch.setattr(Q, "SIMHASH_MAX_BUCKET_SIZE", 10)
    capped = Q.q_simhash_near_dup_pairs(spark, p).collect()
    assert len(capped) == 59
    assert all(r["a_id"] == 0 and r["hamming"] == 0 and r["jaccard"] == 1.0 for r in capped)
    monkeypatch.setattr(Q, "SIMHASH_MAX_BUCKET_SIZE", 10_000)
    uncapped = Q.q_simhash_near_dup_pairs(spark, p).collect()
    assert len(uncapped) == 60 * 59 // 2


def _write_identical_vecs(spark, path: str, n: int):
    v = [float(i % 7 - 3) for i in range(64)]
    spark.createDataFrame(
        [(i, v) for i in range(n)], "vec_id long, embedding array<float>"
    ).write.parquet(f"{path}/embeddings.parquet")


def test_embedding_pairs_dense_bucket_is_linear(spark, tmp_path, monkeypatch):
    """50 identical vectors land every hyperplane-LSH table in one bucket —
    the SemDeDup dense-region case. Star cap => n-1 pairs; uncapped => n^2/2.
    Distinct dirs per variant: the session edge cache keys on sf_dir."""
    pa = str(tmp_path / "emb_a")
    pb = str(tmp_path / "emb_b")
    _write_identical_vecs(spark, pa, 50)
    _write_identical_vecs(spark, pb, 50)
    monkeypatch.setattr(Q, "EMB_MAX_BUCKET_SIZE", 10)
    capped = Q.q_embedding_near_dup_pairs(spark, pa).collect()
    assert len(capped) == 49
    assert all(r["a_id"] == 0 and r["cos_sim"] == 1.0 for r in capped)
    monkeypatch.setattr(Q, "EMB_MAX_BUCKET_SIZE", 10_000)
    uncapped = Q.q_embedding_near_dup_pairs(spark, pb).collect()
    assert len(uncapped) == 50 * 49 // 2


def test_embedding_clusters_survive_star_cap(spark, tmp_path, monkeypatch):
    """CC over star edges keeps the dense region one cluster."""
    p = str(tmp_path / "embc")
    _write_identical_vecs(spark, p, 30)
    monkeypatch.setattr(Q, "EMB_MAX_BUCKET_SIZE", 5)
    clusters = Q.q_embedding_near_dup_clusters(spark, p).collect()
    assert len({r["cluster_id"] for r in clusters}) == 1


def test_skew_report_formula_matches_actual_candidate_pairs(spark):
    """dedup_skew_report's edges_emitted column claims the exact pre-dedup
    candidate count candidate_pairs produces per bucket size (star: size-1,
    clique: size*(size-1)/2). Pin the formula against the ACTUAL operator on
    planted buckets with no cross-bucket pair overlap (so dropDuplicates is
    a no-op and counts must match exactly)."""
    cap = 5
    rows = (
        [(1, i) for i in range(20)]        # star bucket: 19 edges
        + [(2, 100 + i) for i in range(4)]  # clique: 6 edges
        + [(3, 200), (3, 201)]              # clique: 1 edge
    )
    buckets = spark.createDataFrame(rows, "bucket_key long, doc_id long")
    pairs, overflow = lsh.candidate_pairs(
        buckets, max_bucket_size=cap, key_col="bucket_key", id_col="doc_id"
    )
    sizes = lsh.bucket_stats(buckets, key_col="bucket_key")
    hist = {
        r["bucket_size"]: r
        for r in sizes.groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .collect()
    }
    formula_total = sum(
        r["n_buckets"] * ((sz - 1) if sz > cap else sz * (sz - 1) // 2)
        for sz, r in ((r["bucket_size"], r) for r in hist.values())
        for sz in [r["bucket_size"]]
    )
    assert formula_total == 19 + 6 + 1
    assert pairs.count() == formula_total
    assert overflow.count() == 1  # only the size-20 bucket is a star


def test_skew_report_fires_on_testdata(spark):
    """The driver-visible report must show the star machinery BINDING at the
    gate's scale (VERDICT r3 item 6: 'nonzero star-bucket count'): sf0.01
    has word-3-shingle buckets up to df=7 > SKEW_REPORT_CAP=4."""
    rows = Q.q_dedup_skew_report(spark, "/root/testdata/sf0.01").collect()
    stars = [r for r in rows if r["is_star"] == 1]
    assert stars, rows
    assert sum(r["n_buckets"] for r in stars) > 0
    for r in rows:
        sz = r["bucket_size"]
        per = (sz - 1) if r["is_star"] else sz * (sz - 1) // 2
        assert r["edges_emitted"] == r["n_buckets"] * per


def test_incremental_candidate_pairs_unit(spark):
    """Direct contract test of the shared streaming-candidate operator
    (extracted r4 from incremental.py, reused by the embedding stream):
    small buckets pair new x everyone; oversized buckets emit star edges
    anchored on the HISTORY minimum (falling back to overall min only when
    the bucket has no history members)."""
    cap = 3
    # bucket 1: small — history {10, 11}, new {2}
    # bucket 2: oversized — history {20, 21, 22}, new {5, 6} (hist_min = 20)
    # bucket 3: oversized, history-free — new {30, 31, 32, 33} (all_min = 30)
    all_rows = (
        [(1, 10, False), (1, 11, False), (1, 2, True)]
        + [(2, 20, False), (2, 21, False), (2, 22, False), (2, 5, True), (2, 6, True)]
        + [(3, 30, True), (3, 31, True), (3, 32, True), (3, 33, True)]
    )
    all_b = spark.createDataFrame(all_rows, "bucket long, vec_id long, is_new boolean")
    new_b = all_b.where("is_new").select("bucket", "vec_id")
    got = {
        (r["a_id"], r["b_id"])
        for r in lsh.incremental_candidate_pairs(
            new_b, all_b, cap, key_col="bucket", id_col="vec_id"
        ).collect()
    }
    assert got == {
        (2, 10), (2, 11),                      # small: new x history
        (5, 20), (6, 20),                      # star on HISTORY min (not 5!)
        (30, 31), (30, 32), (30, 33),          # history-free star on all_min
    }
