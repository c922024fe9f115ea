"""Collection-level (repo/source) MinHash: merge → band → candidates.

Why this exists (SURVEY §2.4 X74): fork/mirror detection at 10^12-file scale
needs REPO-level similarity, and the two obvious shapes both break down:

  * inverted-index join over per-repo item sets (operators/collections.py)
    is exact but materializes one row per (item, repo) — at 10^8 repos whose
    vocabularies/shingle sets run 10^5-10^7 items each, the join input is
    10^13+ rows and ubiquitous items fan out quadratically;
  * per-repo set sketches computed from concatenated content would require
    shuffling every file's text to its repo — a corpus-sized text shuffle.

MinHash is a monoid under elementwise min: the signature of a UNION of token
sets is the elementwise minimum of the member signatures (each coordinate is
min over the union's hashes = min of the per-set minima). So repo signatures
are a plain aggregation over the per-file raw minima the pipeline already
computes — no text moves, per-repo state is ``size`` longs, and the merged
minima re-enter the exact same LSH banding + skew-managed pair topology as
documents (operators/lsh.py). The reference's kernel makes the same property
available (min-of-mins over any stream split; MinHashTokenFilter's minima are
order-insensitive) but only ever applies it per field value — the rollup is
a genuine scale extension, not plugin parity.

Merge shape: posexplode(minima) → groupBy(group, pos).min — a partial-agg
shuffle (map-side combine reduces every partition to <= n_groups x size rows
before the exchange), then collect_list(struct(pos, m)) re-assembles the
merged array per group. The b-bit PACKED signature is deliberately not
mergeable (pack_bbit keeps low bits only; see functions/udfs.minhash_mins_udf)
— rollups must consume the raw-minima column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_minima(
    mins_df: DataFrame, group_col: str, mins_col: str = "mins"
) -> DataFrame:
    """(group_col, mins array<long>) -> one row per group with the
    elementwise-min merged minima (the group's union-set MinHash signature).

    Rows with a null minima array (null content) contribute nothing; a group
    with only null members is absent from the output (no token set to
    sketch), matching the kernel's null semantics."""
    pos = mins_df.where(F.col(mins_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(mins_col)).alias("pos", "m"),
    )
    merged = pos.groupBy("grp", "pos").agg(F.min("m").alias("m"))
    return (
        merged.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias(mins_col)
        )
        .select(F.col("grp").alias(group_col), mins_col)
    )
