"""Physical-plan audits: pin the scale-critical plan shapes so a regression
(lost column pruning, flipped broadcast side, lost partial aggregation,
redundant shuffles) fails loudly at test time, not at 100 TB.
"""

from __future__ import annotations

import re

from minhash_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_sample_prunes_columns(spark):
    """deterministic_sample must not read the full row — only the projected
    columns + the filter input reach the parquet scan."""
    plan = _formatted(Q.q_deterministic_sample(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "lang", "source", "text"}, cols


def test_rollup_prunes_columns(spark):
    plan = _formatted(Q.q_source_rollup(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"source", "lang", "text"}, cols


def test_similar_docs_broadcasts_query_side(spark):
    """The 10-row query side must be the broadcast side (a flipped broadcast
    ships the corpus to every executor and OOMs at scale)."""
    plan = _plan(Q.q_similar_docs_topk(spark, SF))
    assert "Broadcast" in plan, plan
    # the build side carries qtoks (the aliased query shingles)
    bcast = plan[plan.index("Broadcast"):]
    assert "qtoks" in bcast[:4000], bcast[:1500]


def test_embedding_topk_broadcasts_query_side(spark):
    plan = _plan(Q.q_embedding_topk(spark, SF))
    assert "Broadcast" in plan, plan


def test_source_rollup_partial_aggregation(spark):
    """groupBy must map-side combine: two HashAggregate levels (partial +
    final) around one Exchange."""
    plan = _plan(Q.q_source_rollup(spark, SF))
    n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    assert n_agg >= 2, plan
    assert "Exchange" in plan


def test_event_sessions_single_user_shuffle(spark):
    """Both window passes and the session aggregate share ONE hash
    partitioning on user_id — exactly one exchange on user_id, no
    re-shuffle between the lag window, the cumsum window and the groupBy."""
    plan = _plan(Q.q_event_sessions(spark, SF))
    user_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan


def test_quality_filter_stays_whole_stage_codegen(spark):
    """Native-expression queries must not contain Python evals in the plan."""
    for q in (Q.q_quality_filter, Q.q_token_counts, Q.q_lang_id, Q.q_source_rollup,
              Q.q_pii_scan):
        plan = _plan(q(spark, SF))
        assert "PythonUDF" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan, (
            q.__name__, plan)


def test_pii_scan_zero_shuffle_pruned(spark):
    """pii_scan is a pure per-row map fused into the scan: no Exchange, and
    the parquet read prunes to doc_id+text."""
    plan = _formatted(Q.q_pii_scan(spark, SF))
    assert "Exchange" not in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols


def test_repetition_scores_zero_shuffle_native(spark):
    """repetition_scores is a pure map: no Exchange, no Python evals."""
    plan = _plan(Q.q_repetition_scores(spark, SF))
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan, plan


def test_decontaminate_broadcasts_eval_side(spark):
    """The (tiny) eval-span side must be the broadcast build side; the
    training corpus must never be shuffled for the join."""
    plan = _plan(Q.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    # the only exchange allowed is the final groupBy aggregation (plus the
    # broadcast exchange itself) — no hashpartitioning on `span`
    span_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "span" in ln
    ]
    assert not span_shuffles, plan


def test_boilerplate_spans_partial_aggregation(spark):
    """span doc-frequency and the per-doc rollup must both map-side combine,
    and the exploded span table must be shuffled exactly ONCE (the complement
    form n_shared = n_spans - n_solo removed the r2 join-back's second full
    span exchange)."""
    plan = _plan(Q.q_boilerplate_spans(spark, SF))
    n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    assert n_agg >= 6, plan  # (partial+final) x (span-df, n_solo, per-doc)
    span_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "span#" in ln
    ]
    assert len(span_shuffles) == 1, plan


def test_passage_dedup_single_chunk_shuffle(spark):
    """The corpus-sized passage table must be shuffled exactly once — the
    complement form (n_dup = n_chunks - n_unique, with n_chunks read straight
    off the doc row) removed the occurrence-count join-back's second full
    chunk exchange."""
    plan = _plan(Q.q_passage_dedup(spark, SF))
    chunk_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "chunk#" in ln
    ]
    assert len(chunk_shuffles) == 1, plan


def test_embedding_ann_ivf_broadcasts_query_probes(spark):
    """IVF candidate generation joins the corpus against BROADCAST query
    probes — the corpus side must not be shuffled on cell."""
    plan = _plan(Q.q_embedding_ann_ivf(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    cell_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "cell" in ln
    ]
    assert not cell_shuffles, plan


def test_aqe_skew_join_config_and_shape(spark):
    """The LSH/verify joins rely on AQE skew-join splitting as the second
    line of defense behind the star cap; a config regression (AQE or
    skewJoin disabled) would be silent at sandbox scale and catastrophic at
    100 TB. Pin (a) the session config and (b) the skew-join-ELIGIBLE shape
    of the candidate self-join: a shuffled join (SortMergeJoin /
    ShuffledHashJoin) on the bucket key under an AdaptiveSparkPlan — a
    broadcast join would be both skew-ineligible and OOM-bound (both sides
    are corpus-sized)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    from minhash_spark.operators import lsh

    # At sandbox scale Catalyst legitimately broadcasts the tiny bucket
    # table; the invariant that matters at 100 TB is what it plans when the
    # table EXCEEDS the broadcast threshold. Simulate the at-scale size
    # estimate by disabling auto-broadcast and pin the shuffled-join shape.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = Q.load(spark, SF, "documents")
        buckets = Q._doc_spans(docs, 3).withColumnRenamed("span", "bucket_key")
        pairs, _ = lsh.candidate_pairs(
            buckets, 4, key_col="bucket_key", id_col="doc_id"
        )
        plan = _plan(pairs)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "AdaptiveSparkPlan" in plan, plan
    inner = [
        ln for ln in plan.splitlines()
        if re.search(r"SortMergeJoin|ShuffledHashJoin", ln) and "Inner" in ln
    ]
    assert inner, plan  # the pair self-join shuffles on the bucket key
    assert "bucket_key" in inner[0], inner
    # the explicitly-broadcast overflow-key joins must SURVIVE the threshold
    # change (lsh.candidate_pairs marks them with F.broadcast — a planner
    # hint, not a size estimate): the anti/semi probes against the tiny
    # overflow set must never shuffle the corpus-sized bucket table.
    hinted = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and ("LeftAnti" in ln or "LeftSemi" in ln)
    ]
    assert len(hinted) >= 2, plan


def test_dedup_skew_report_single_span_shuffle(spark):
    """The skew report must itself be skew-safe: one combiner-reduced shuffle
    of the exploded shingle table, a tiny histogram aggregate, and NO joins
    (the report must be runnable on a corpus whose pair generation is not)."""
    plan = _plan(Q.q_dedup_skew_report(spark, SF))
    assert "Join" not in plan, plan
    key_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "bucket_key" in ln
    ]
    assert len(key_shuffles) == 1, plan
    n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    assert n_agg >= 4, plan  # (partial+final) x (bucket sizes, histogram)


def test_event_props_rollup_native_partial_agg(spark):
    """get_json_object must stay JVM-side (no Python eval) and the rollup
    must map-side combine."""
    plan = _plan(Q.q_event_props_rollup(spark, SF))
    assert "PythonUDF" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan, plan
    n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    assert n_agg >= 2, plan
