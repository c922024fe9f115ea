"""Shared embedding-similarity building blocks: the hyperplane-LSH bucket
UDF and the exact-cosine column expression. Used by the batch query suite
(plans/queries.py: ANN, SemDeDup near-dup) and the streaming ingest twin
(streaming/embeddings.py) — ONE hyperplane family, seeded-deterministic, so
batch state and streamed state bucket identically (the same contract the
MinHash paths keep through a shared MinHashConfig).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANN_TABLES = 32  # L independent hash tables
ANN_BITS = 4  # hyperplanes (bits) per table
ANN_PLANE_SEED = 1234  # hyperplane family seed (batch == stream == oracle)


def ann_bucket_udf(n_tables: int = ANN_TABLES, n_bits: int = ANN_BITS, dim: int = 64):
    """embedding -> array<long> of L bucket keys (table index folded in).

    One Arrow batch = one numpy matmul against all L*b hyperplanes — the
    vectorized scale path (per-row expression trees would build 128 separate
    64-term fold expressions). Planes are seeded-deterministic so every
    executor, the streaming twin, and the test oracle derive the same
    family."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        planes = np.random.default_rng(ANN_PLANE_SEED).standard_normal(
            (n_tables * n_bits, dim)
        )
        V = np.stack(vecs.to_numpy())  # (n, dim)
        signs = (V @ planes.T) > 0  # (n, L*b)
        weights = (2 ** np.arange(n_bits, dtype=np.int64))[None, None, :]
        keys = (signs.reshape(len(V), n_tables, n_bits) * weights).sum(axis=2)
        keys += (np.arange(n_tables, dtype=np.int64) << np.int64(n_bits))[None, :]
        return pd.Series(list(keys))

    # values are fully deterministic (seeded family); the marking is an
    # optimizer hint only — exploding the bucket array plants an implicit
    # size>0 filter that otherwise gets pushed below the projection and
    # evaluates the L*b matmul UDF TWICE per row (guide §4.4, observed as
    # stacked ArrowEvalPython pairs in the r6 ann_lsh plan capture)
    return _udf.asNondeterministic()


def cosine_col(a, b):
    """Exact cosine between two array<double> columns, entirely native
    (F.zip_with/F.aggregate — JVM-side, no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)
