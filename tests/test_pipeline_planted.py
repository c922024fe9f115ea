"""E2E on corpus B (planted near-duplicate pseudo-source files with the
universal-license-header skew stressor): recall >= 0.99, precision, skew-cap
metrics, cluster agreement with ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.operators import lsh
from minhash_spark.plans.pipeline import DedupPipeline
from minhash_spark.sources.fixtures import corpus_b
from minhash_spark.sources.io import TableIO

CFG = MinHashConfig(
    seed=0,
    size=128,
    bit=1,
    tokenizer="char_shingle",
    tokenizer_params={"k": 9},
    num_bands=32,
    rows_per_band=4,
    verify_threshold=0.8,
)


@pytest.fixture(scope="module")
def planted(spark):
    files, truth_pairs, truth_clusters = corpus_b(n_clusters=100, n_singletons=200, seed=42)
    df = spark.createDataFrame(files).cache()
    return df, set(truth_pairs), dict(truth_clusters)


def test_planted_recall_and_precision(spark, planted, tmp_path):
    df, truth_pairs, truth_clusters = planted
    io = TableIO(str(tmp_path / "ckpt"))
    pipe = DedupPipeline(spark, io, CFG)
    out = pipe.run(df).cache()

    assert out.count() == len(truth_clusters)

    got = {r["file_id"]: r["cluster_id"] for r in out.collect()}
    # pair recall: ground-truth pairs that ended up in the same cluster
    hit = sum(got[a] == got[b] for a, b in truth_pairs)
    recall = hit / len(truth_pairs)
    assert recall >= 0.99, f"recall {recall}"

    # pair precision: predicted same-cluster pairs that are true pairs
    from collections import defaultdict

    members = defaultdict(list)
    for fid, cid in got.items():
        members[cid].append(fid)
    predicted = set()
    for cid, ms in members.items():
        ms.sort()
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                predicted.add((ms[i], ms[j]))
    if predicted:
        precision = len(predicted & truth_pairs) / len(predicted)
        assert precision >= 0.99, f"precision {precision}"

    # cluster-level agreement: min-id representative must match ground truth
    for fid, cid in truth_clusters.items():
        assert got[fid] == got[cid], "cluster representative mismatch"


def test_bucket_cap_logs_overflow(spark, planted):
    df, _, _ = planted
    from minhash_spark.operators import signatures

    with_id = signatures.with_identity(df)
    reps = signatures.distinct_contents(with_id)
    sigs = signatures.compute_signatures(reps, CFG)
    buckets = lsh.explode_buckets(sigs).cache()

    # the license header makes some band buckets near-universal? with full
    # 64-bit band keys the header alone does NOT collapse buckets (it is only
    # ~20% of each file's shingles), so force the cap low to exercise the path
    pairs_capped, overflow_capped = lsh.candidate_pairs(buckets, max_bucket_size=2)
    pairs_free, overflow_free = lsh.candidate_pairs(buckets, max_bucket_size=10**6)
    n_over = overflow_capped.count()
    assert n_over > 0
    assert overflow_free.count() == 0
    assert pairs_capped.count() <= pairs_free.count()
    buckets.unpersist()


def test_oph_scheme_pipeline(spark, tmp_path):
    """The OPH scale scheme must recover the same clusters on a small corpus."""
    from minhash_spark.config import MinHashConfig

    files, truth_pairs, truth_clusters = corpus_b(n_clusters=40, n_singletons=150, seed=7)
    df = spark.createDataFrame(files)
    cfg = MinHashConfig(
        seed=0,
        size=128,
        bit=1,
        scheme="oph",
        tokenizer="char_shingle",
        tokenizer_params={"k": 9},
        verify_threshold=0.8,
        filter_common_shingles=True,
        common_sample_docs=1000,
    )
    io = TableIO(str(tmp_path / "oph"))
    out = DedupPipeline(spark, io, cfg).run(df)
    got = {r["file_id"]: r["cluster_id"] for r in out.collect()}
    hit = sum(got[a] == got[b] for a, b in truth_pairs)
    assert hit / len(truth_pairs) >= 0.99


def test_distributed_cc_path_matches_union_find_in_pipeline(spark, planted, tmp_path):
    """VERDICT r3 item 5: the code path a 100 TB run would actually take —
    large/small-star contraction INSIDE plans/pipeline.py (edge count above
    the driver cutoff) — must produce clusters identical to the driver
    union-find path, end-to-end on the planted corpus (not just the unit
    boundary test on synthetic graphs)."""
    df, _, _ = planted
    out_uf = DedupPipeline(spark, TableIO(str(tmp_path / "uf")), CFG).run(df)
    # cc_driver_threshold=0: every nonempty edge set takes the distributed
    # alternating-star path through build_clusters
    out_star = DedupPipeline(
        spark, TableIO(str(tmp_path / "star")), CFG, cc_driver_threshold=0
    ).run(df)
    uf = {r["file_id"]: r["cluster_id"] for r in out_uf.collect()}
    star = {r["file_id"]: r["cluster_id"] for r in out_star.collect()}
    assert uf == star  # same representative (min id) per file, exactly
