"""X74-X76: repo-level MinHash-merge dedup, novelty attribution, locality.

The load-bearing fact for X74 is the union monoid: MinHash(A ∪ B) equals the
elementwise min of MinHash(A) and MinHash(B) — pinned here byte-exact at the
kernel level AND through the distributed merge path, because the whole
repo-rollup design (no text shuffle, 128 longs of per-repo state) rests on
it. The b-bit packed signature is NOT mergeable; the UDF layer refuses the
unmergeable (OPH rotation-filled) scheme.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from minhash_spark import kernel
from minhash_spark.config import MinHashConfig
from minhash_spark.operators.repo import merge_minima
from minhash_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_kernel_minima_are_a_min_monoid():
    """minhash_mins(tokens(A) + tokens(B)) == elementwise min of the parts —
    for random splits, disjoint sets, and overlapping sets."""
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(200)]
    for trial in range(5):
        a = list(rng.choice(vocab, size=rng.integers(1, 80)))
        b = list(rng.choice(vocab, size=rng.integers(1, 80)))
        m = kernel.minhash_mins([a, b, a + b], seed=0, size=128)
        assert np.array_equal(np.minimum(m[0], m[1]), m[2]), trial


def test_merge_minima_matches_kernel_union(spark):
    """Distributed merge path (posexplode -> min -> reassemble) == kernel
    minima of the union token set, byte-exact, for every source at sf0.001."""
    from minhash_spark.functions.udfs import minhash_mins_udf
    from minhash_spark.tokenize import word_tokens

    cfg = Q.REPO_CFG
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("source", "text")
    mins = minhash_mins_udf(cfg)
    per_file = docs.select("source", mins(F.col("text")).alias("mins"))
    merged = {
        r["source"]: np.asarray(r["mins"], dtype=np.int64)
        for r in merge_minima(per_file, "source").collect()
    }
    rows = docs.collect()
    by_source: dict[str, list[str]] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).extend(word_tokens(r["text"]))
    for src, toks in by_source.items():
        want = kernel.minhash_mins([toks], seed=cfg.seed, size=cfg.size)[0]
        assert np.array_equal(merged[src], want), src


def test_merge_minima_skips_null_rows(spark):
    from minhash_spark.functions.udfs import minhash_mins_udf

    cfg = Q.REPO_CFG
    df = spark.createDataFrame(
        [("a", "x y z"), ("a", None), ("b", None)], "source string, text string"
    )
    mins = minhash_mins_udf(cfg)
    per_file = df.select("source", mins(F.col("text")).alias("mins"))
    got = {r["source"]: r["mins"] for r in merge_minima(per_file, "source").collect()}
    # null text contributes nothing; all-null group is absent entirely
    assert set(got) == {"a"}
    want = kernel.minhash_mins([["x", "y", "z"]], seed=cfg.seed, size=cfg.size)[0]
    assert np.array_equal(np.asarray(got["a"], dtype=np.int64), want)


def test_mins_udf_refuses_oph():
    from minhash_spark.functions.udfs import minhash_mins_udf

    cfg = MinHashConfig(seed=0, size=128, bit=1, scheme="oph", tokenizer="word")
    with pytest.raises(ValueError, match="not .*mergeable|mergeable"):
        minhash_mins_udf(cfg)


def test_repo_signature_dedup_planted_fork(spark, tmp_path):
    """A planted fork (repo 'fork' = copy of 'orig' plus one small file)
    surfaces as a high-jaccard pair; an unrelated repo pairs with nobody."""
    orig_files = [
        "def alpha(): return beta gamma delta",
        "class Epsilon: zeta eta theta iota kappa",
        "import lam mu nu xi omicron pi rho",
    ]
    unrelated = ["completely different content entirely elsewhere unseen"]
    data = (
        [(i, t, "en", "orig", len(t)) for i, t in enumerate(orig_files)]
        + [(10 + i, t, "en", "fork", len(t)) for i, t in enumerate(orig_files)]
        + [(20, "sigma tau", "en", "fork", 9)]
        + [(30 + i, t, "en", "other", len(t)) for i, t in enumerate(unrelated)]
    )
    p = str(tmp_path / "repos")
    spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{p}/documents.parquet")
    rows = Q.q_repo_signature_dedup(spark, p).collect()
    pairs = {(r["a_source"], r["b_source"]): r for r in rows}
    assert set(pairs) == {("fork", "orig")}
    r = pairs[("fork", "orig")]
    # orig vocabulary = 21 distinct words; fork adds {sigma, tau}
    # -> jaccard = 21/23 ~ 0.913 >= 0.9
    assert r["n_shared"] == 21 and r["n_a_terms"] == 23 and r["n_b_terms"] == 21
    assert r["jaccard"] == pytest.approx(21 / 23)


def test_novelty_scores_first_seen_attribution(spark, tmp_path):
    """Copy of an earlier doc scores 0 novelty; the original keeps 1.0; a
    short doc (< 13 tokens) uses its whole text as one span."""
    base = " ".join(f"w{i}" for i in range(20))
    data = [
        (0, base),
        (1, base),  # exact copy, later id -> nothing novel
        (2, " ".join(f"u{i}" for i in range(20))),  # fresh -> fully novel
        (3, "tiny doc"),  # < 13 tokens: whole text = one (novel) span
    ]
    p = str(tmp_path / "nov")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in Q.q_novelty_scores(spark, p).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0
    assert got[1]["n_spans"] == got[0]["n_spans"] == 8  # 20 - 13 + 1
    assert got[2]["novelty"] == 1.0
    assert got[3]["n_spans"] == 1 and got[3]["novelty"] == 1.0


def test_dedup_locality_accounts_for_every_edge(spark):
    """Bin totals == pair count; bins are genuine digit counts; min/max
    jaccard bound the pair jaccards."""
    pairs = Q.q_near_dup_pairs(spark, SF).collect()
    card = Q.q_dedup_locality(spark, SF).collect()
    assert sum(r["n_pairs"] for r in card) == len(pairs)
    for r in card:
        assert len(str(r["min_dist"])) == r["dist_digits"]
        assert len(str(r["max_dist"])) == r["dist_digits"]
        assert r["min_dist"] <= r["max_dist"]
        assert 0 < r["min_jaccard"] <= r["max_jaccard"] <= 1.0


def test_merge_minima_incremental_equals_full(spark):
    """The monoid gives O(delta) daily repo-signature maintenance: merging
    yesterday's MERGED minima with today's delta-file minima equals a full
    recompute over all files — pinned byte-exact. (This is the X62/X66
    carry-forward story at collection granularity, for free by algebra.)"""
    from minhash_spark.functions.udfs import minhash_mins_udf

    cfg = Q.REPO_CFG
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    day1 = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    mins = minhash_mins_udf(cfg)

    def per_file(df):
        return df.select("source", mins(F.col("text")).alias("mins"))

    full = {
        r["source"]: list(r["mins"])
        for r in merge_minima(per_file(docs), "source").collect()
    }
    carried = merge_minima(per_file(day1), "source").unionByName(
        merge_minima(per_file(delta), "source")
    )
    incr = {
        r["source"]: list(r["mins"])
        for r in merge_minima(carried, "source").collect()
    }
    assert incr == full


def test_cross_source_dup_matrix_accounts_for_every_edge(spark):
    pairs = Q.q_near_dup_pairs(spark, SF).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    card = Q.q_cross_source_dup_matrix(spark, SF).collect()
    assert sum(r["n_pairs"] for r in card) == len(pairs)
    # recompute the matrix directly from the pair list
    from collections import Counter

    want = Counter(
        tuple(sorted((src[p["a_id"]], src[p["b_id"]])) ) for p in pairs
    )
    got = {(r["a_source"], r["b_source"]): r["n_pairs"] for r in card}
    assert got == dict(want)
    for r in card:
        assert r["a_source"] <= r["b_source"]
        assert 0.8 <= r["min_jaccard"] <= r["max_jaccard"] <= 1.0
