"""Signature similarity search over an indexed signatures table — the
reference's QUERY flow (index docs with a minhash field, search by the query
text's signature; codelibs/elasticsearch-minhash README.md:70-77).

Three modes, all driven by a query signature computed with the SAME kernel
path as indexing (functions.udfs.signature_for_text):

  * ``lsh``   — candidates are rows sharing >= 1 LSH band key with the query
                (an ``arrays_overlap`` scan predicate: no shuffle, no
                full-corpus scoring — the only shape that serves interactive
                queries against 10^12 indexed rows), ranked by signature
                bit-match (MinHash.compare semantics);
  * ``brute`` — score every row (exact bit-match ranking);
  * ``exact`` — the ES term-query analog: byte-identical stored signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_spark.functions.udfs import sig_bitmatch_udf


def search_signatures(
    sigs: DataFrame,
    qsig: bytes,
    qbands: list[int],
    top_k: int = 10,
    mode: str = "lsh",
    bit: int = 1,
) -> DataFrame:
    """Rank the signatures table against a query signature.

    ``sigs`` needs columns (rep_id, sig) and, for mode='lsh', (bands).
    Returns (rep_id, bit_match, est_jaccard) for lsh/brute — ordered, top-k —
    or (rep_id, sig_b64-compatible columns) for exact."""
    if mode == "exact":
        return sigs.where(F.col("sig") == F.lit(bytearray(qsig))).limit(top_k)
    # null signatures (null-content docs) and width-mismatched rows would
    # score NaN, and Spark sorts NaN ABOVE every number — they'd outrank
    # every real match. Filter them before scoring.
    cand = sigs.where(F.col("sig").isNotNull() & (F.length("sig") == len(qsig)))
    if mode == "lsh":
        band_lit = F.array(*[F.lit(b) for b in qbands])
        cand = cand.where(F.arrays_overlap(F.col("bands"), band_lit))
    elif mode != "brute":
        raise ValueError(f"unknown search mode {mode!r}")
    bitmatch = sig_bitmatch_udf()
    scored = cand.select(
        "rep_id", bitmatch(F.col("sig"), F.lit(bytearray(qsig))).alias("bit_match")
    )
    # invert E[per-bit match] = J + (1-J)/2 => J = 2p - 1 (clamped), same as
    # kernel.estimate_jaccard: compare() measures PER-BIT equality whose
    # baseline is 1/2 at EVERY bit width (2^-bit is the per-BLOCK collision
    # rate — a different statistic; using it overestimated est_jaccard for
    # bit > 1 indexes, ranking unaffected)
    est = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), 2.0 * F.col("bit_match") - 1.0)
    )
    return (
        scored.orderBy(F.desc("bit_match"), F.asc("rep_id"))
        .limit(top_k)
        .select("rep_id", "bit_match", F.round(est, 6).alias("est_jaccard"))
    )


__all__ = ["search_signatures"]
