"""Commit-history operators (operators/history.py): snapshot selection,
churn cards, and the content-keyed incremental signature pass.

Two deterministic snapshots derived from the corpus_b generator:
snapshot 2 re-lands every file under a new commit (the daily-crawl shape),
mutates ~10% of contents, drops a few paths, and adds a few new files —
so the carried/computed/retired cases all occur.
"""

from __future__ import annotations

import hashlib

import pytest

from minhash_spark.config import MinHashConfig
from minhash_spark.operators import history
from minhash_spark.sources import fixtures

CFG = MinHashConfig(
    seed=0,
    size=128,
    bit=1,
    tokenizer="char_shingle",
    tokenizer_params={"k": 9},
    num_bands=32,
    rows_per_band=4,
)


def _snapshots():
    files, _, _ = fixtures.corpus_b(n_clusters=10, n_singletons=80, seed=7)
    snap1 = [dict(r, commit="a" * 40) for r in files]
    snap2 = []
    for i, r in enumerate(sorted(snap1, key=lambda r: (r["repo"], r["path"]))):
        if i % 17 == 3:
            continue  # path deleted in snapshot 2
        r2 = dict(r, commit="b" * 40)
        if i % 10 == 0:  # ~10% of paths change content
            r2["content"] = r2["content"] + "\n// touched in snapshot 2"
        snap2.append(r2)
    for j in range(5):  # brand-new files
        snap2.append(
            {
                "repo": "org-new/repo-new",
                "path": f"src/new/File{j}.py",
                "commit": "b" * 40,
                "lang": "py",
                "content": f"def new_fn_{j}():\n    return {j}\n",
            }
        )
    return snap1, snap2


@pytest.fixture(scope="module")
def snaps(spark):
    snap1, snap2 = _snapshots()
    cols = ["repo", "path", "commit", "lang", "content"]
    df1 = spark.createDataFrame([[r[c] for c in cols] for r in snap1], cols)
    df2 = spark.createDataFrame([[r[c] for c in cols] for r in snap2], cols)
    return snap1, snap2, df1, df2


def test_select_snapshot_partitions_by_head(spark, snaps):
    snap1, snap2, df1, df2 = snaps
    both = df1.unionByName(df2)
    heads2 = both.select("repo").distinct().withColumn(
        "commit", history.F.lit("b" * 40)
    )
    got = history.select_snapshot(both, heads2)
    assert got.count() == len(snap2)
    assert got.where(history.F.col("commit") != "b" * 40).count() == 0
    # heads pointing at snapshot 1 recover snapshot 1 exactly
    heads1 = heads2.withColumn("commit", history.F.lit("a" * 40))
    assert history.select_snapshot(both, heads1).count() == len(snap1)


def test_churn_report_counts_versions(spark, snaps):
    snap1, snap2, df1, df2 = snaps
    both = df1.unionByName(df2)
    rep = {(r["repo"], r["path"]): r for r in history.churn_report(both).collect()}
    touched = {
        (r["repo"], r["path"]) for r in snap2
    } & {(r["repo"], r["path"]) for r in snap1}
    changed = {
        (r2["repo"], r2["path"])
        for r2 in snap2
        if r2["content"].endswith("touched in snapshot 2")
    }
    for key, row in rep.items():
        assert 1 <= row["n_versions"] <= row["n_commits"] <= 2
        if key in changed:
            assert row["n_versions"] == 2
            # head (commit 'b...' > 'a...') must be the snapshot-2 content
            c2 = next(
                r["content"]
                for r in snap2
                if (r["repo"], r["path"]) == key
            )
            assert row["head_sha256"] == hashlib.sha256(c2.encode()).hexdigest()
        elif key in touched:
            assert row["n_versions"] == 1  # re-landed unchanged


def test_repo_churn_rollup_mass_conservation(spark, snaps):
    _, _, df1, df2 = snaps
    both = df1.unionByName(df2)
    per_path = history.churn_report(both).collect()
    rollup = {r["repo"]: r for r in history.repo_churn_rollup(both).collect()}
    assert sum(r["n_paths"] for r in rollup.values()) == len(per_path)
    assert sum(r["n_file_commits"] for r in rollup.values()) == sum(
        r["n_commits"] for r in per_path
    )
    for r in rollup.values():
        assert 0.0 <= r["stable_path_ratio"] <= 1.0


def test_incremental_signatures_equal_full_recompute(spark, snaps):
    _, snap2, df1, df2 = snaps
    prev = history.incremental_content_signatures(df1, None, CFG)
    inc = history.incremental_content_signatures(df2, prev, CFG)
    full = history.incremental_content_signatures(df2, None, CFG)
    inc_rows = {r["content_sha256"]: (bytes(r["sig"]), tuple(r["bands"])) for r in inc.collect()}
    full_rows = {r["content_sha256"]: (bytes(r["sig"]), tuple(r["bands"])) for r in full.collect()}
    assert inc_rows == full_rows
    # coverage: exactly the distinct contents of snapshot 2; retired content
    # from snapshot 1 must NOT leak through the carry-forward
    shas2 = {hashlib.sha256(r["content"].encode()).hexdigest() for r in snap2}
    assert set(inc_rows) == shas2


def test_incremental_kernel_runs_only_on_delta(spark, snaps):
    """The computed branch of the incremental pass must contain exactly the
    content shas absent from the previous snapshot — the >100x-at-scale
    kernel saving is the whole point, so pin the delta selection itself."""
    snap1, snap2, df1, df2 = snaps
    prev = history.incremental_content_signatures(df1, None, CFG)
    f2 = history.with_content_sha(df2).select("content_sha256").distinct()
    delta = f2.join(prev.select("content_sha256"), "content_sha256", "left_anti")
    shas1 = {hashlib.sha256(r["content"].encode()).hexdigest() for r in snap1}
    shas2 = {hashlib.sha256(r["content"].encode()).hexdigest() for r in snap2}
    expect_new = shas2 - shas1
    got_new = {r["content_sha256"] for r in delta.collect()}
    assert got_new == expect_new
    assert 0 < len(expect_new) < len(shas2)  # both branches genuinely exercised


def test_cluster_diff_events(spark):
    """Synthetic two-day clusters_all tables with every transition planted:
    stable, grown (new content joins), merged (content from two yesterday
    clusters), new (all-new content); swapped args report the split."""
    cols = ["content_sha256", "cluster_id"]
    yesterday = spark.createDataFrame(
        [
            ("s1", 1), ("s2", 1),          # cluster 1
            ("s3", 3),                      # cluster 3
            ("s4", 4), ("s5", 4),          # cluster 4
        ],
        cols,
    )
    today = spark.createDataFrame(
        [
            ("s1", 1), ("s2", 1),          # stable
            ("s3", 3), ("s6", 3),          # grown (s6 is new content)
            ("s4", 7), ("s5", 8),          # yesterday's 4 SPLIT into 7+8
            ("s9", 9), ("s10", 9),         # new cluster, all-new content
        ],
        cols,
    )
    from minhash_spark.operators.history import cluster_diff

    fwd = {r["cluster_id"]: r for r in cluster_diff(today, yesterday).collect()}
    assert fwd[1]["event"] == "stable" and fwd[1]["n_files"] == 2
    assert fwd[3]["event"] == "grown" and fwd[3]["n_only_content"] == 1
    assert fwd[7]["event"] == "stable" and fwd[8]["event"] == "stable"
    assert fwd[9]["event"] == "new" and fwd[9]["n_shared_content"] == 0
    back = {r["cluster_id"]: r for r in cluster_diff(yesterday, today).collect()}
    assert back[4]["event"] == "merged"  # split seen from yesterday's side
    assert back[4]["n_counterpart_clusters"] == 2
    assert back[1]["event"] == "stable" and back[3]["event"] == "stable"
