"""Round-6 optimization equivalence pins: each restructured operator must
produce byte/row-identical output to the shape it replaced.

1. signatures.representatives_by_id (metadata rep decision + broadcast
   attach — zero content exchanges) == distinct_contents (content-shuffle
   groupBy), including exact-dup collapse and NULL-content rows.
2. queries._pair_cosine_udf (broadcast-matrix einsum over bare id pairs)
   == the cosine_col array-join path, to the emitted 4-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minhash_spark.operators import signatures


def _planted_files(spark):
    rows = [
        # two exact dups of one content + a singleton + a NULL-content row
        ("r1", "a.py", "c1", "py", "shared content body"),
        ("r2", "b.py", "c2", "py", "shared content body"),
        ("r1", "c.py", "c3", "py", "unique content body"),
        ("r3", "d.py", "c4", "py", None),
        ("r3", "e.py", "c5", "py", None),
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_representatives_by_id_matches_distinct_contents(spark):
    files = _planted_files(spark)
    with_id = signatures.with_identity(files)
    a = signatures.distinct_contents(with_id, num_partitions=4)
    b = signatures.representatives_by_id(with_id, signatures.rep_id_set(with_id))
    # same rows, both directions (rep_id = min(file_id) per distinct sha,
    # one row per distinct content incl. the NULL-sha group)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert b.count() == 3  # 2 distinct contents + the NULL-content group


def test_pair_cosine_matrix_matches_join_path(spark):
    import numpy as np

    from minhash_spark.functions.embeddings import cosine_col
    from minhash_spark.plans import queries as Q

    rng = np.random.default_rng(7)
    vecs = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pairs = (
        emb.select(F.col("vec_id").alias("a_id"))
        .crossJoin(emb.select(F.col("vec_id").alias("b_id")))
        .where(F.col("a_id") < F.col("b_id"))
    )
    join_path = (
        pairs.join(emb.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va")), "a_id")
        .join(emb.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb")), "b_id")
        .select("a_id", "b_id", F.round(cosine_col(F.col("va"), F.col("vb")), 4).alias("cos_sim"))
    )
    matrix_path = pairs.select(
        "a_id", "b_id",
        F.round(Q._pair_cosine_udf(spark, emb)(F.col("a_id"), F.col("b_id")), 4).alias("cos_sim"),
    )
    assert join_path.exceptAll(matrix_path).count() == 0
    assert matrix_path.exceptAll(join_path).count() == 0
