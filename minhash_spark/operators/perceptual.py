"""Shared machinery for perceptual-hash near-dup operators (X67 image
dHash, X71 audio energy-envelope fingerprint): a pigeonhole multi-index
band join over 64-bit hashes with doc-level neighbor statistics.

Recall contract: a pair within hamming distance <= ham_max differs in at
most ham_max of the four 16-bit bands, so with ham_max <= 3 at least one
band is identical (pigeonhole) and the band equi-join surfaces the pair;
an exact F.bit_count(xor) filter then keeps precisely the <= ham_max set.
Exhaustively pinned in tests/test_media.py::test_dhash_pigeonhole_band_guarantee.

Scale shape: the join runs over DISTINCT hashes only — exact perceptual
duplicates collapse in a groupBy first, so a billion copies of one meme
cost one join row — and neighbor MASS is aggregated at hash granularity
before re-joining to docs; no doc-level pair table is ever materialized.
Band-key skew on degenerate corpora would reuse the star-cap treatment in
operators/lsh.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
BAND_BITS = 16


def hamming_neighbor_stats(hashes: DataFrame, ham_max: int) -> DataFrame:
    """(doc_id, phash) -> (doc_id, phash, n_near, min_ham).

    n_near = number of OTHER docs within hamming <= ham_max of this doc's
    hash (exact, thanks to the pigeonhole guarantee — requires
    ham_max < N_BANDS); min_ham = distance to the nearest of them (0 iff
    another doc shares the hash exactly; NULL iff isolated)."""
    if ham_max >= N_BANDS:
        raise ValueError(f"pigeonhole guarantee requires ham_max < {N_BANDS}")
    hstats = hashes.groupBy("phash").agg(F.count("*").alias("n_docs"))
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("b"),
                    F.shiftrightunsigned("phash", BAND_BITS * i)
                    .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                    .alias("v"),
                )
                for i in range(N_BANDS)
            ]
        )
    ).alias("band")
    bands = hstats.select("phash", "n_docs", band).select(
        "phash", "n_docs", F.col("band.b").alias("b"), F.col("band.v").alias("v")
    )
    a, b2 = bands.alias("a"), bands.alias("b2")
    cand = (
        a.join(b2, (F.col("a.b") == F.col("b2.b")) & (F.col("a.v") == F.col("b2.v")))
        .where(F.col("a.phash") < F.col("b2.phash"))
        .select(
            F.col("a.phash").alias("ph_a"),
            F.col("a.n_docs").alias("na"),
            F.col("b2.phash").alias("ph_b"),
            F.col("b2.n_docs").alias("nb"),
        )
        .dropDuplicates(["ph_a", "ph_b"])  # a pair may collide in >1 band
    )
    pairs = cand.withColumn(
        "ham",
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long"),
    ).where(F.col("ham") <= ham_max)
    sym = pairs.select(
        F.col("ph_a").alias("phash"), F.col("nb").alias("other_n"), "ham"
    ).unionByName(
        pairs.select(F.col("ph_b").alias("phash"), F.col("na").alias("other_n"), "ham")
    )
    nbr = sym.groupBy("phash").agg(
        F.sum("other_n").alias("nbr_mass"), F.min("ham").alias("nbr_min")
    )
    enriched = hstats.join(nbr, "phash", "left")
    return hashes.join(enriched, "phash").select(
        "doc_id",
        "phash",
        (F.col("n_docs") - 1 + F.coalesce(F.col("nbr_mass"), F.lit(0)))
        .cast("long")
        .alias("n_near"),
        F.when(F.col("n_docs") > 1, F.lit(0).cast("long"))
        .otherwise(F.col("nbr_min"))
        .alias("min_ham"),
    )


def hash_hex(col: str) -> F.Column:
    """Unsigned zero-padded 16-hex rendering of a signed 64-bit hash column
    (matches DuckDB's lpad(lower(hex(x::UBIGINT)), 16, '0'))."""
    return F.lpad(F.lower(F.hex(col)), 16, "0")
