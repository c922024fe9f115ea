"""Stage P6: candidate-pair verification.

Two-tier (SURVEY §2.3 P6):
  1. cheap prefilter on the stored signatures — b-bit bit-match fraction
     (MinHash.compare semantics, SURVEY §2.1.6) inverted to a Jaccard
     estimate; pairs far below threshold never touch content. Joining two
     16-byte signatures is ~100x cheaper than joining two contents.
  2. exact token-set Jaccard over the SAME tokenizer config for survivors.

Both tiers are Arrow-batched; the only per-pair Python is set intersection
inside the pandas UDF on the (small) surviving candidate set.

Fault tolerance: the intra-stage barriers below use ``localCheckpoint()``
(executor-local blocks, lost on executor preemption). That is deliberate:
the DURABLE unit of recovery is the whole edges stage — TableIO publishes
it atomically with a manifest, so a preempted run replays at most one
stage, never the pipeline. On heavily preemptible clusters, set
``spark.minhash.reliableBarriers=true`` on the session (plus
``sparkContext.setCheckpointDir``) and the barriers below become reliable
``checkpoint()`` calls — the plan shape is unchanged (pytest-pinned); local
is the right default because reliable checkpoints pay an HDFS/object-store
round-trip per barrier on EVERY healthy run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import sig_bitmatch_udf

# max verify pairs sharing one (a_id, salt) task-group; above this the group
# is hash-split so a giant star bucket cannot starve the exact-Jaccard stage
_VERIFY_GROUP_CAP = 1024

# session conf key: set to "true" (with sparkContext.setCheckpointDir) to
# swap the intra-stage localCheckpoint barriers for RELIABLE checkpoints on
# preemption-heavy clusters — the documented knob from the module docstring
RELIABLE_BARRIERS_CONF = "spark.minhash.reliableBarriers"

# session conf key: "true" makes barrier() a NO-OP so the full logical plan
# stays visible to .explain(). FOR PLAN AUDITING ONLY (tools/explain_audit.py)
# — never execute under this mode: barriers also pin nondeterministic
# boundaries and prevent recompute, so a no-op barrier changes execution
# semantics, not just performance.
PLAN_ONLY_BARRIERS_CONF = "spark.minhash.planOnlyBarriers"


def barrier(df: DataFrame) -> DataFrame:
    """Intra-stage materialization barrier. ``localCheckpoint()`` by default
    (executor-local blocks — right for healthy clusters, no object-store
    round-trip); when ``spark.minhash.reliableBarriers=true`` is set on the
    session (plus ``setCheckpointDir``), uses ``checkpoint()`` so a preempted
    executor replays nothing. The plan shape downstream is identical either
    way (pytest-pinned). ``spark.minhash.planOnlyBarriers=true`` disables the
    barrier entirely so audits can capture the pre-materialization build
    plan — explain-only, see PLAN_ONLY_BARRIERS_CONF."""
    if df.sparkSession.conf.get(PLAN_ONLY_BARRIERS_CONF, "false") == "true":
        return df
    if df.sparkSession.conf.get(RELIABLE_BARRIERS_CONF, "false") == "true":
        return df.checkpoint()
    return df.localCheckpoint()


def verify_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    contents: DataFrame,
    cfg: MinHashConfig,
    exclude_sorted=None,
) -> DataFrame:
    """(a_id, b_id) -> (a_id, b_id, jaccard) with jaccard >= cfg.verify_threshold.

    ``signatures``: (rep_id, sig) — 16-byte payloads, joined to EVERY candidate.
    ``contents``: (rep_id, content) — joined only to prefilter SURVIVORS, so
    full text never shuffles for pairs the signature estimate already rejects.
    """
    sigs = signatures.select("rep_id", "sig")
    bitmatch = sig_bitmatch_udf()

    est_min = cfg.verify_threshold - cfg.sig_prefilter_margin
    # sig_bitmatch_udf measures PER-BIT equality: matching minima (prob J)
    # agree on all b sampled bits, differing minima agree per bit with prob
    # 1/2 (low bits of independent 64-bit minima are uniform) — E[bit match]
    # = J + (1-J)/2 for EVERY bit width, so the inversion uses q = 1/2, not
    # 2^-b (2^-b is the per-BLOCK collision rate, a different statistic;
    # using it made the prefilter nearly a no-op for bit > 1)
    q = 0.5
    p_min = est_min * (1.0 - q) + q
    if cfg.containment_threshold is not None:
        # containment pairs (small file inside big) can have arbitrarily low
        # Jaccard, so the signature estimate cannot prefilter them
        p_min = 0.0
    # r5 materialized the candidate pairs here unconditionally ("removing
    # this barrier tripled the edges-stage wall at local[8]") — that cost
    # came from the bucket-stats broadcast subquery re-running inside the
    # big verify job, which lsh.candidate_pairs now prevents by
    # materializing the overflow stats itself (r6). With that fixed, the
    # prefilter path has exactly ONE consumer of the candidate plan (the
    # signature join below), so checkpointing |candidates| rows first is
    # pure cost — measured 1-1.3 s/run slower at bench scale. Containment
    # mode still materializes: there `pairs` IS the survivor set and
    # feeds three downstream references.
    if p_min <= 0.0:
        # the prefilter is a guaranteed no-op (containment mode): skip the
        # two signature joins + bitmatch pass entirely instead of paying
        # them to keep 100% of rows
        survivors = barrier(pairs)
    else:
        joined = pairs.join(
            sigs.select(F.col("rep_id").alias("a_id"), F.col("sig").alias("sig_a")), "a_id"
        ).join(sigs.select(F.col("rep_id").alias("b_id"), F.col("sig").alias("sig_b")), "b_id")
        # survivors feed THREE downstream references (the id semi-join union
        # uses it twice, the content join once): materialize once or the
        # signature join + bitmatch UDF subtree re-executes per reference
        survivors = barrier(
            joined.withColumn("bit_match", bitmatch(F.col("sig_a"), F.col("sig_b")))
            .where(F.col("bit_match") >= F.lit(p_min))
            .select("a_id", "b_id")
        )
    # survivors reference only a small fraction of the corpus; a semi-join on
    # the candidate id set keeps NON-candidate content out of the content
    # movement entirely (at bench scale this is the difference between
    # shuffling the whole 660 MB corpus and ~a quarter of it).
    needed = (
        survivors.select(F.col("a_id").alias("rep_id"))
        .union(survivors.select(F.col("b_id").alias("rep_id")))
        .distinct()
    )
    slim = contents.join(needed, "rep_id", "left_semi")
    # Scoring layout (guide §8: decide with small rows, move big rows once).
    # The r5 tail joined content onto the pair table twice and then
    # repartitioned the doubled-content rows — the heavy text bytes crossed
    # THREE exchanges (content_a also rode through the b-side join). Now the
    # scoring partition is decided on the bare (a_id, b_id) pair table:
    #   1. _pkey = hash(a_id, salt) % par, computed on id pairs only.
    #      Per-a_id multiplicity is UNBOUNDED under star topology, so groups
    #      above _VERIFY_GROUP_CAP pairs are salted by hash(b_id) into
    #      ceil(count/cap) sub-groups — a 100k-pair star spreads across
    #      ~100 partitions instead of starving on one, while typical groups
    #      keep full co-location for the scorer's distinct-text dedup.
    #   2. sides = distinct (rep_id, _pkey) — the placement map, bounded by
    #      2x|survivor pairs|, attached to the slimmed content by equi-join
    #      (AQE broadcasts it when small; even as a shuffle join it moves
    #      ids + pkeys and content ONCE, never doubled pair rows).
    #   3. ONE cogroup exchange on _pkey ships each needed content row to
    #      its scoring partition exactly once per partition that needs it
    #      (<= once per pair, typically far less — a doc in k co-located
    #      pairs ships one copy, not k), where the pairs are assembled and
    #      scored in vectorized batches (score_similarity_frame — the same
    #      body similarity_udf wraps, so semantics cannot drift).
    par = pairs.sparkSession.sparkContext.defaultParallelism
    # pkey modulus sized from the survivor count (a cheap count over the
    # barrier's materialized blocks): ~_VERIFY_GROUP_CAP pairs per cogroup
    # group, so the Python scorer's per-group pandas frame is BOUNDED
    # (~cap x 2 docs) at any corpus size, never survivors/partitions —
    # while never dropping below cluster parallelism.
    n_surv = survivors.count()
    n_keys = max(par, -(-n_surv // _VERIFY_GROUP_CAP))
    a_counts = survivors.groupBy("a_id").agg(F.count("*").alias("_a_cnt"))
    salted = (
        survivors.join(a_counts, "a_id")
        .withColumn(
            "_salt",
            F.when(
                F.col("_a_cnt") > _VERIFY_GROUP_CAP,
                F.pmod(
                    F.xxhash64("b_id"),
                    F.ceil(F.col("_a_cnt") / _VERIFY_GROUP_CAP).cast("long"),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("_a_cnt")
    )
    pairs_k = salted.withColumn(
        "_pkey", F.pmod(F.xxhash64("a_id", "_salt"), F.lit(n_keys)).cast("int")
    ).drop("_salt")
    # fresh column name on the content side: sides shares pairs_k's lineage,
    # and cogrouping both branches on the same attribute id trips the
    # ambiguous-self-join analyzer check
    sides = (
        pairs_k.select(F.col("a_id").alias("rep_id"), F.col("_pkey").alias("_ckey"))
        .union(pairs_k.select(F.col("b_id").alias("rep_id"), F.col("_pkey").alias("_ckey")))
        .distinct()
    )
    ship = slim.join(sides, "rep_id")
    id_fields = [f for f in pairs_k.schema.fields if f.name in ("a_id", "b_id")]
    out_schema = T.StructType(
        id_fields
        + [
            T.StructField("jaccard", T.DoubleType()),
            T.StructField("containment", T.DoubleType()),
            T.StructField("substr", T.BooleanType()),
        ]
    )

    def _score_group(pairs_pdf, content_pdf):
        import pandas as pd

        from minhash_spark.functions.udfs import score_similarity_frame

        if len(pairs_pdf) == 0:
            return pd.DataFrame(
                {
                    "a_id": pairs_pdf["a_id"],
                    "b_id": pairs_pdf["b_id"],
                    "jaccard": pd.Series([], dtype="float64"),
                    "containment": pd.Series([], dtype="float64"),
                    "substr": pd.Series([], dtype="object"),
                }
            )
        lookup = dict(zip(content_pdf["rep_id"], content_pdf["content"]))
        a = pairs_pdf["a_id"].map(lookup)
        b = pairs_pdf["b_id"].map(lookup)
        s = score_similarity_frame(a, b, cfg, exclude_sorted)
        s.insert(0, "b_id", pairs_pdf["b_id"].values)
        s.insert(0, "a_id", pairs_pdf["a_id"].values)
        return s

    scored = (
        pairs_k.groupBy("_pkey")
        .cogroup(ship.groupBy("_ckey"))
        .applyInPandas(_score_group, out_schema)
    )
    accept = F.col("jaccard") >= F.lit(cfg.verify_threshold)
    if cfg.containment_threshold is not None:
        cont_ok = F.col("containment") >= F.lit(cfg.containment_threshold)
        if cfg.substring_verify:
            # set-level containment admits shuffled-shingle false positives;
            # require the exact normalized-substring witness (north rule)
            cont_ok = cont_ok & (F.col("substr") == F.lit(True))
        accept = accept | cont_ok
    return scored.where(accept).drop("substr")
