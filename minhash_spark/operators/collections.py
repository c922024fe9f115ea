"""Collection-level overlap (repo/source dedup, fork detection).

The reference dedups at document granularity (one signature per field value,
MinHashFieldMapper.java:253-279); a training-data pipeline over source code
additionally needs COLLECTION-level dedup — "is repo B a fork/copy of repo
A?" — computed as the Jaccard similarity of the two repos' file-content-hash
sets (The Stack / StarCoder pipelines dedup forks exactly this way).

Spark shape (the scale path): never materialize per-collection item sets on
the driver and never all-pairs the collections. Instead the classic
inverted-index join:

    (collection, item) distinct  →  self-equi-join on item  →
    groupBy (a, b) count         →  join per-collection sizes  →  Jaccard

Every stage is a partial-aggregable shuffle on a key Catalyst understands;
the per-collection size table is tiny (one row per collection) and is
broadcast. An item shared by d collections contributes d·(d-1)/2 pair rows —
for file-hash fork detection d is small (a given file blob exists in few
repos); for vocabulary-style items pass ``max_item_df`` to drop
ubiquitous items (a df cap, the same boilerplate-filter move the winnowing
span matcher uses) before the quadratic fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collection_overlap(
    df: DataFrame,
    coll_col: str,
    item_col: str,
    min_jaccard: float = 0.0,
    max_item_df: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard over the distinct-``item_col`` sets of each
    ``coll_col`` group.

    Returns (a, b, n_shared, n_a, n_b, jaccard) with a < b and
    jaccard >= ``min_jaccard``; pairs with zero shared items are absent (they
    never meet in the equi-join). Jaccard is one int/int division — exact
    and engine-stable. ``max_item_df``: drop items present in more than this
    many collections BEFORE pairing (skew guard; changes semantics, so it is
    opt-in and the dropped mass is the caller's to log).
    """
    items = df.select(
        F.col(coll_col).alias("coll"), F.col(item_col).alias("item")
    ).distinct()
    if max_item_df is not None:
        dfc = items.groupBy("item").agg(F.count("*").alias("item_df"))
        items = (
            items.join(dfc.where(F.col("item_df") <= max_item_df), "item")
            .select("coll", "item")
        )
    # the distinct (coll, item) subtree feeds THREE consumers (both join
    # sides and the size table); without this, Catalyst re-executes the
    # scan+explode+distinct per consumer — at corpus scale that triples the
    # dominant cost. Cached (recomputable, spillable), not localCheckpoint:
    # survives executor loss on a preemptible cluster.
    items = items.persist()
    sizes = items.groupBy("coll").agg(F.count("*").alias("n"))
    a = items.select(F.col("coll").alias("a"), "item")
    b = items.select(F.col("coll").alias("b"), "item")
    shared = (
        a.join(b, "item")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        shared.join(F.broadcast(sizes.select(F.col("coll").alias("a"), F.col("n").alias("n_a"))), "a")
        .join(F.broadcast(sizes.select(F.col("coll").alias("b"), F.col("n").alias("n_b"))), "b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
    )
    if min_jaccard > 0.0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out.select(
        "a",
        "b",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


def repo_fork_candidates(
    files: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Fork detection over a (repo, ..., content) file table: Jaccard of the
    repos' distinct content-sha256 sets. A fork that diverged by a few
    commits still shares most file blobs, so it surfaces at high Jaccard;
    unrelated repos share (almost) nothing and never pair up."""
    hashed = files.select(
        F.col(repo_col).alias("repo"), F.sha2(F.col(content_col), 256).alias("sha")
    )
    return collection_overlap(hashed, "repo", "sha", min_jaccard=min_jaccard).select(
        F.col("a").alias("a_repo"),
        F.col("b").alias("b_repo"),
        "n_shared",
        F.col("n_a").alias("n_a_files"),
        F.col("n_b").alias("n_b_files"),
        "jaccard",
    )


def collapse_forks(
    files: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
    min_jaccard: float = 0.7,
) -> DataFrame:
    """Repo-level dedup (The Stack's fork collapse): connect repos whose
    file-blob Jaccard >= ``min_jaccard`` (:func:`repo_fork_candidates`),
    resolve fork GROUPS with connected components, and keep one
    representative repo per group — the one with the most distinct file
    blobs, ties to the lexically smallest name (deterministic).

    Returns one row per repo: (repo, fork_group, n_blobs, is_kept). The
    training-set move is ``where(is_kept)`` BEFORE file-level dedup: dropping
    a 10k-file fork here is one row-filter instead of 10k near-dup
    verifications downstream.

    Scale shape: the pair table is collection-level (|repos| ~ 10^7 at the
    north-rule corpus, pairs far fewer after the Jaccard floor) — orders of
    magnitude below the file table; CC runs on repo-name nodes
    (scale-adaptive, same operator as file clustering); the per-repo blob
    counts are one partial-aggregable distinct + count; the winner pick is
    one min_by over fork groups. File contents never move — only sha256s.
    """
    pairs = repo_fork_candidates(files, repo_col, content_col, min_jaccard)
    edges = pairs.select(F.col("a_repo").alias("u"), F.col("b_repo").alias("v"))
    from minhash_spark.operators import components

    comp = components.connected_components(edges)
    sizes = (
        files.select(
            F.col(repo_col).alias("repo"), F.sha2(F.col(content_col), 256).alias("sha")
        )
        .distinct()
        .groupBy("repo")
        .agg(F.count("*").cast("long").alias("n_blobs"))
    )
    tagged = sizes.join(
        comp.select(F.col("node").alias("repo"), F.col("component").alias("fork_group")),
        "repo",
        "left",
    ).select(
        "repo",
        F.coalesce(F.col("fork_group"), F.col("repo")).alias("fork_group"),
        "n_blobs",
    )
    winners = tagged.groupBy("fork_group").agg(
        F.min_by(
            "repo", F.struct((-F.col("n_blobs")).alias("neg_size"), F.col("repo"))
        ).alias("kept_repo")
    )
    return tagged.join(winners, "fork_group").select(
        "repo",
        "fork_group",
        "n_blobs",
        (F.col("repo") == F.col("kept_repo")).alias("is_kept"),
    )
