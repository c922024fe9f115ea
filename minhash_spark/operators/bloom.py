"""Distributed Bloom-filter build + vectorized probe for semi-join
prefiltering (X70: decontamination against a benchmark set too large to
broadcast exactly).

The exact-broadcast decontamination path (q_decontaminate) ships the full
eval span set to every executor — right for ~10^5 spans, impossible for a
10^9-span benchmark suite (tens of GB). The Bloom path broadcasts a BITMAP
instead (1.2 GB at 10^9 keys / 1e-3 fpp), drops ~99.9% of training spans
map-side, and lets the exact join see only the survivors. Bloom filters
have no false negatives, so prefilter + exact join is EXACTLY the exact
join — the DuckDB oracle for the bloom variant is the same SQL.

Hashing discipline: keys are pre-hashed JVM-side with two independent
xxhash64 seeds (stays in whole-stage codegen; Python never sees the span
strings), and the k Bloom probes derive from double hashing
pos_i = (h1 + i*h2) mod m (Kirsch-Mitzenmacher 2006 — two hash functions
suffice for asymptotically optimal fpp). The Python side only does
vectorized uint64 NumPy on the two hash columns.

m is a power of two so `mod` is a mask; k = round(ln 2 * m / n) is the
fpp-optimal probe count for n expected keys.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; h1/h2 are uint64 views of
    the signed xxhash64 columns. Odd-step guard: force h2 odd so the probe
    stride is coprime with the power-of-two m (a zero/even stride would
    degenerate k probes into one)."""
    step = (h2 | np.uint64(1))[:, None]
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * step) & np.uint64(m - 1)


def optimal_k(m_bits: int, n_keys: int) -> int:
    return max(1, round(math.log(2) * m_bits / max(1, n_keys)))


def build_bitmap(keys_hashed: DataFrame, m_bits: int, k: int) -> bytes:
    """OR-reduce per-partition bitmaps of the (h1, h2) key table into one
    m_bits-wide Bloom bitmap.

    Scale shape: each task folds its partition into a local m/8-byte buffer
    (vectorized np.bitwise_or.at), emits ONE row, and the driver ORs the
    P partition bitmaps — driver memory is P x m/8 transient, network is
    P x m/8 total. That P x m/8 product is ENFORCED, not advised: the build
    side is coalesced so the collected buffers total <= ~512 MB, so a
    10^9-key / 1.2 GB filter folds from a handful of wide tasks instead of
    10^4 (same driver-cap discipline as IVF_TRAIN_CAP and the prefix-sum
    bucket scan in q_sequence_packing)."""
    n_bytes = m_bits // 8
    parts_cap = max(1, (512 << 20) // n_bytes)

    def fold(batches):
        import pandas as pd

        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h1 = pdf["h1"].to_numpy(dtype="int64").view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype="int64").view(np.uint64)
            pos = _positions(h1, h2, k, m_bits).ravel()
            np.bitwise_or.at(bitmap, pos >> np.uint64(3),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    keys = keys_hashed.select("h1", "h2")
    if keys.rdd.getNumPartitions() > parts_cap:
        keys = keys.coalesce(parts_cap)
    parts = keys.mapInPandas(fold, "bitmap binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def probe_filter(df: DataFrame, spark, bitmap: bytes, k: int, m_bits: int) -> DataFrame:
    """Keep rows whose (h1, h2) double-hash probes are ALL set in bitmap.

    The bitmap rides an explicit SparkContext broadcast (one copy per
    executor, not per task) and the membership test is a vectorized Arrow
    pandas_udf — uint64 arithmetic over the two pre-hashed columns only."""
    from pyspark.sql.types import BooleanType

    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def member(h1s, h2s):
        import pandas as pd

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = h1s.to_numpy(dtype="int64").view(np.uint64)
        h2 = h2s.to_numpy(dtype="int64").view(np.uint64)
        pos = _positions(h1, h2, k, m_bits)
        bits = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return pd.Series(bits.all(axis=1))

    return df.where(member(F.col("h1"), F.col("h2")))


def with_key_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Append the two JVM-side xxhash64 columns the bloom build/probe use."""
    return df.withColumn("h1", F.xxhash64(F.col(key_col), F.lit(1))).withColumn(
        "h2", F.xxhash64(F.col(key_col), F.lit(2))
    )
