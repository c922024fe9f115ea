"""Stage P4-P5: LSH banding -> bucket table -> candidate pairs, skew-managed.

Design (SURVEY §2.3, §4.3):
  * band keys were already computed inside the signature UDF from the FULL
    64-bit minima (random-pair bucket collision ~2^-64 — what keeps candidate
    volume ~linear at 10^12 rows; banding over the b-bit signature would
    collide at 2^-b*r and explode quadratically);
  * buckets = posexplode(bands); the band index is folded into the key, so a
    single long column shuffles/joins;
  * candidate pairs = native self-equi-join of the bucket table on band_hash
    with id ordering — whole-stage-codegen JVM path, AQE skew-join eligible;
  * skew control BEFORE the join: bucket sizes are counted (one cheap agg);
    buckets above ``max_bucket_size`` are dropped from pair generation and
    LOGGED (metrics), never silently — boilerplate shingles (license headers)
    otherwise create 10^6-member buckets => 10^12 intra-bucket pairs.
    Dropped buckets lose only pairs whose every shared band is oversized;
    near-dup pairs share many independent bands, so recall impact is
    measured (tests) rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_buckets(signatures: DataFrame) -> DataFrame:
    """(content_sha256, rep_id, bands) -> (band_hash, rep_id)."""
    return signatures.select(
        F.col("rep_id"), F.explode(F.col("bands")).alias("band_hash")
    )


def bucket_stats(buckets: DataFrame, key_col: str = "band_hash") -> DataFrame:
    return buckets.groupBy(key_col).agg(F.count("*").alias("bucket_size"))


def candidate_pairs(
    buckets: DataFrame,
    max_bucket_size: int,
    key_col: str = "band_hash",
    id_col: str = "rep_id",
    sizes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (pairs, overflow_stats).

    ``sizes``: optional precomputed ``bucket_stats(buckets)`` result. A
    caller that ALSO consumes the stats (the pipeline's overflow metrics
    aggregate) should materialize them once and pass them in — otherwise the
    bucket-explode + count aggregation runs once for the metrics action and
    again inside the pair plan.

    Key-generic (``key_col``/``id_col``): the same skew-managed topology
    serves MinHash bands, SimHash bands, and embedding hyperplane buckets.

    pairs: distinct (a_id, b_id), a_id < b_id.
      * buckets <= ``max_bucket_size``: all intra-bucket pairs via native
        self-equi-join (whole-stage codegen; AQE skew-join eligible);
      * larger buckets: STAR topology — every member pairs only with the
        bucket's min id. Boilerplate buckets (shared license headers make a
        band's minima identical across unrelated files) otherwise emit
        O(n^2) candidates; the star keeps genuine giant near-dup clusters
        connected through their representative at O(n) candidates, and the
        (cheap) failed verifications of noise-bucket star edges replace the
        (quadratic) ones. Nothing is silently dropped; star buckets are
        reported in overflow_stats.
    overflow_stats: (key_col, bucket_size) of buckets handled as stars.
    """
    if sizes is None:
        sizes = bucket_stats(buckets, key_col)
    # materialize the (tiny) overflow stats rows once: they feed FOUR
    # broadcast consumers below (both anti-join sides of the self-join, the
    # star semi-join, the star-rep groupBy) plus the caller's overflow
    # metrics, and without the barrier each consumer re-runs the full
    # bucket-stats aggregate — i.e. four-plus shuffles of the corpus-sized
    # bucket table instead of one (observed as 4 duplicated
    # Generate->HashAggregate->Exchange subtrees in the simhash/near-dup
    # plans). Barriering the post-filter rows (hundreds, not |buckets|)
    # also lets the pipeline drop its full-width bucket_stats barrier —
    # the one stats aggregation runs inside this barrier build and only
    # the overflow survivors are ever materialized.
    from minhash_spark.operators.verify import barrier

    overflow = barrier(sizes.where(F.col("bucket_size") > max_bucket_size))
    over_keys = F.broadcast(overflow.select(key_col))
    ok = buckets.join(over_keys, key_col, "left_anti")
    a = ok.alias("a")
    b = ok.alias("b")
    pairs_small = (
        a.join(b, on=key_col)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
        )
    )
    big = buckets.join(over_keys, key_col, "left_semi")
    reps = big.groupBy(key_col).agg(F.min(id_col).alias("rep"))
    pairs_star = (
        big.join(reps, key_col)
        .where(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("a_id"), F.col(id_col).alias("b_id"))
    )
    pairs = pairs_small.unionByName(pairs_star).dropDuplicates(["a_id", "b_id"])
    return pairs, overflow


def incremental_candidate_pairs(
    new_buckets: DataFrame,
    all_buckets: DataFrame,
    max_bucket_size: int,
    key_col: str = "band_hash",
    id_col: str = "rep_id",
) -> DataFrame:
    """Streaming-ingest variant of ``candidate_pairs``: candidates between a
    micro-batch's NEW members and the accumulated (history + new) bucket
    table, skew-managed with HISTORY-ANCHORED star caps.

    ``new_buckets``: (key_col, id_col) for this batch's members only.
    ``all_buckets``: (key_col, id_col, is_new boolean) for history + batch.

    Buckets at or under the cap pair every new member with every other
    member (new x history plus new x new). Oversized buckets emit star
    edges only, anchored on the HISTORY-side minimum id when history members
    exist (falling back to the overall minimum for history-free buckets):
    ids are hashes, so a new doc routinely displaces the overall minimum,
    and anchoring on it would connect new docs only to each other — the
    new-vs-history edges through that bucket would be permanently lost.
    With the history anchor the chain stays intact across batches: every
    member, when new, paired with the then-current history minimum, and the
    history minimum only ever moves to an id that was itself new (already
    connected) in an earlier batch. Key-generic like ``candidate_pairs`` —
    the same topology serves MinHash bands and embedding hyperplane buckets.

    Returns distinct (a_id, b_id), a_id < b_id. Used by
    ``streaming/incremental.py`` (documents) and ``streaming/embeddings.py``
    (vectors); the anchor semantics are pinned by
    ``tests/test_streaming.py::test_incremental_star_anchors_on_history_min``.
    """
    stats = all_buckets.groupBy(key_col).agg(
        F.count("*").alias("bucket_size"),
        F.min(F.when(~F.col("is_new"), F.col(id_col))).alias("hist_min"),
        F.min(id_col).alias("all_min"),
    )
    small = all_buckets.join(
        stats.where(F.col("bucket_size") <= max_bucket_size).select(key_col),
        key_col,
        "left_semi",
    )
    cand_small = (
        new_buckets.alias("a")
        .join(small.alias("b"), key_col)
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("a_id"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("b_id"),
        )
    )
    star_anchor = F.coalesce(F.col("hist_min"), F.col("all_min"))
    cand_star = (
        new_buckets.join(
            stats.where(F.col("bucket_size") > max_bucket_size)
            .select(key_col, star_anchor.alias("anchor")),
            key_col,
        )
        .where(F.col(id_col) != F.col("anchor"))
        .select(
            F.least(F.col(id_col), F.col("anchor")).alias("a_id"),
            F.greatest(F.col(id_col), F.col("anchor")).alias("b_id"),
        )
    )
    return cand_small.unionByName(cand_star).dropDuplicates(["a_id", "b_id"])
