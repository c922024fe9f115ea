"""Physical-plan audit: capture .explain('formatted') for the headline
queries and grep the properties that matter at 100 TB — pushed filters,
pruned scan schemas, broadcast vs sort-merge sides, WholeStageCodegen spans,
and the absence of cartesian products. Output -> EXPLAIN.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "67108864")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

AUDITED = [
    # near_dup_pairs / fingerprint_matches / threshold_sweep moved to
    # BUILD_AUDITED below — their steady-state plans are cache reads; the
    # expensive DAG is captured pre-barrier in the build-plan section
    "exact_dup_clusters",
    "embedding_topk",
    "embedding_ann_lsh",
    "token_counts",
    "multimodal_features",
    "embedding_ann_ivf",
    "decontaminate",
    "boilerplate_spans",
    "repetition_scores",
    "event_props_rollup",
    "passage_dedup",
    "tfidf_top_terms",
    "lm_scores",
    "pricing_summary",
    "region_revenue",
    "top_revenue_orders",
    "late_shipment_priority",
    "code_stats",
    "secret_scan",
    "license_scan",
    "source_overlap",
    "event_funnel",
    "event_retention",
    "stratified_sample",
    "dedup_skew_report",
    "shard_manifest",
    "dedup_rewrite",
    "word_entropy_scores",
    "quality_weighted_sample",
    "length_histogram",
    "dedup_growth_curve",
    "approx_corpus_profile",
    "repeated_substring_scores",
    "multimodal_frames",
    # round-5 additions: the mixture card must be one partial agg + 1-row
    # broadcast cross join; training_order must window by (epoch, shard)
    # with no global sort before the final presentation orderBy; the bloom
    # path must show the probe filter BEFORE the exact span join
    "mixture_weights",
    "training_order",
    "decontaminate_bloom",
    # X75: one exchange on span (partial-agg min), one join back, one
    # exchange on doc_id — no windows, no driver state
    "novelty_scores",
    # X81: two partial-agg groupBys joined on |sources| keys — the rep's
    # source/tokens ride in the argmin struct, so no corpus-sized join back
    "dedup_token_savings",
    # X82: in-row pair transform -> partial-agg groupBy ->
    # TakeOrderedAndProject (no global sort, no self-join)
    "bpe_pair_stats",
]

# Queries whose steady-state plan is a lineage-truncated Scan ExistingRDD
# (they read session caches built through verify.barrier/localCheckpoint).
# Audited separately in BUILD-PLAN mode: spark.minhash.planOnlyBarriers=true
# turns every barrier into a no-op so the full bands -> candidate-join ->
# verify DAG stays visible to .explain() (VERDICT r4 item 5). Plan capture
# only — nothing executes in this mode.
BUILD_AUDITED = [
    "near_dup_pairs",
    "embedding_near_dup_pairs",
    "fingerprint_matches",
    "near_dup_threshold_sweep",
    "containment_dup_pairs",
    # X67: barrier sits on the per-doc hash table; build mode keeps the
    # mapInPandas -> distinct-hash agg -> band self-join DAG visible
    # (audio/video share the identical machinery via _perceptual_dedup)
    "image_phash_dedup",
    # X68: barrier sits on the tokenized frame; build mode shows the scan ->
    # tokenize -> broadcast offsets join -> per-bucket window prefix sum
    "sequence_packing",
    # X76/X77: edge-cache consumers; build mode keeps the full
    # signature -> band join -> verify DAG under the locality/matrix aggs
    "dedup_locality",
    "cross_source_dup_matrix",
    # X74: barriers sit on the merged band table and the candidate pairs
    # (both multi-consumer); build mode shows the partial-agg (grp, pos)
    # min merge, the band self-join, and the broadcast candidate semi-join
    "repo_signature_dedup",
    # X80: edge-cache consumer; build mode keeps the signature -> band join
    # -> verify DAG under the endpoint-union + two-level degree rollup
    "dup_graph_degree",
]

CHECKS = {
    "PushedFilters": "filter pushdown reaches the parquet scan",
    "ReadSchema": "column pruning (scan reads only needed columns)",
    "BroadcastHashJoin": "small side broadcast (no all-to-all shuffle)",
    "WholeStageCodegen": "JVM codegen spans (expressions stay compiled)",
    "CartesianProduct": "!! unbounded cross join — must not appear unguarded",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from minhash_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session(app_name="explain-audit", master="local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = ["# EXPLAIN audit — physical plans of the headline queries", ""]
    out.append(
        f"Captured with `.explain('formatted')` at `{sf_dir}`. Checks: "
        + "; ".join(f"`{k}` = {v}" for k, v in CHECKS.items())
        + ".\n"
    )
    def capture(name, df, header):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = []
        for key in CHECKS:
            n = plan.count(key)
            if n:
                flags.append(f"{key}×{n}")
        out.append(f"## {header}\n")
        out.append(f"**Plan properties:** {', '.join(flags) or '(none matched)'}\n")
        # keep plans readable: the operator tree section only (before Details)
        tree = plan.split("\n\n")[0]
        out.append("```\n" + tree.strip()[:4000] + "\n```\n")

    for name in AUDITED:
        capture(name, qs[name](spark, sf_dir), name)

    # ---- pre-cache build plans (VERDICT r4 item 5) ------------------------
    # barrier() is a no-op under planOnlyBarriers, so the expensive DAG
    # (band explode -> candidate self-join -> bit-match prefilter -> exact
    # Jaccard) is what .explain() sees, instead of a cache-read
    # Scan ExistingRDD. The session caches are cleared around the block so
    # no other consumer can pick up an un-materialized (no-barrier) frame.
    out.append(
        "# Build plans (pre-barrier)\n\n"
        "The queries below read session caches in steady state; the plans\n"
        "here are their CACHE-BUILD DAGs, captured with\n"
        "`spark.minhash.planOnlyBarriers=true` (barriers no-op'd for plan\n"
        "visibility only — nothing executes in this mode).\n"
    )
    from minhash_spark.operators.verify import PLAN_ONLY_BARRIERS_CONF
    from minhash_spark.plans import queries as Qmod

    def clear_caches():
        for cache in (
            Qmod._EDGE_CACHE, Qmod._SIG_CACHE, Qmod._EMB_EDGE_CACHE
        ):
            cache.clear()

    clear_caches()
    spark.conf.set(PLAN_ONLY_BARRIERS_CONF, "true")
    try:
        for name in BUILD_AUDITED:
            capture(name, qs[name](spark, sf_dir), f"{name} (build)")
    finally:
        spark.conf.set(PLAN_ONLY_BARRIERS_CONF, "false")
        clear_caches()
    out.append(
        "## DOUBLE-column hash stability\n\n"
        "Every double column a driver query emits is bit-stable across\n"
        "partition-count variations (float aggregation is order-dependent, so\n"
        "a sum(double)-derived column would hash differently between the\n"
        "sandbox gate and a 1000-executor run). Enforced mechanically, not by\n"
        "audit: `tests/test_double_stability.py` diffs exact collected values\n"
        "at shuffle.partitions=1 vs 32 for every `queries()` entry that emits\n"
        "a double (15+ queries checked). The allowed derivations are exact\n"
        "int/int division (`avg_chars`, `shared_ratio`), `round(..., k)` on\n"
        "both engines (`kept_ratio`, `cos_sim`), per-row expressions\n"
        "(`quality_scores` ratios), and min/max of per-row doubles\n"
        "(`cluster_cohesion`). The oracle gate additionally fails on\n"
        "int-vs-float dtype-class divergence (tools/check_oracles.py) so an\n"
        "uncast DuckDB HUGEINT aggregate is caught locally.\n"
    )
    (ROOT / "EXPLAIN.md").write_text("\n".join(out))
    print("EXPLAIN.md written")
    spark.stop()


if __name__ == "__main__":
    main()
