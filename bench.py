#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline workload is the full dedup pipeline (signatures -> LSH -> verify
-> connected components -> cluster expansion) over the planted source-code
corpus at bench scale (FIXTURES.md §3: 5000 clusters + 50000 singletons,
~330 MB — synthesized deterministically and cached), plus the driver-table
query suite. ``--pipeline-only`` runs just the pipeline and emits its own JSON
(used by tools/bench_scaling.py for the N-vs-4N scaling evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "67108864")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "data")
CORPUS_SPEC = {
    "n_clusters": int(os.environ.get("SPARK_GRAFT_BENCH_CLUSTERS", 5000)),
    "n_singletons": int(os.environ.get("SPARK_GRAFT_BENCH_SINGLETONS", 50000)),
    "seed": 42,
}


def ensure_bench_corpus(spark) -> str:
    """Deterministic planted corpus, generated once and cached as parquet."""
    tag = f"corpus_b_{CORPUS_SPEC['n_clusters']}_{CORPUS_SPEC['n_singletons']}_{CORPUS_SPEC['seed']}"
    path = os.path.join(BENCH_DATA, tag)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from minhash_spark.sources.fixtures import corpus_b

    files, _pairs, _clusters = corpus_b(**CORPUS_SPEC)
    os.makedirs(BENCH_DATA, exist_ok=True)
    spark.createDataFrame(files).repartition(64).write.mode("overwrite").parquet(path)
    return path


def vm_canary() -> dict:
    """Fixed pure-NumPy workload timed to gauge sandbox/VM health (VERDICT r4
    item 3: BENCH_r04 was recorded in a degraded VM window and per-query walls
    moved 2-4x with zero code change). Two signals: ``cold_s`` includes a
    512 MB first-touch allocation (this sandbox serializes page-fault handling
    globally, so cold_s spikes when the VM is degraded); ``warm_s`` re-runs
    the same arithmetic on the already-faulted buffer (pure CPU). Cross-round
    bench deltas should be read as value / (canary vs the other round's
    canary) — a 30% canary swing explains a 30% suite swing without any code
    change. The checksum pins the workload itself as fixed."""
    import numpy as np

    def fold(a):
        for _ in range(3):
            a = (a * np.uint64(0xFF51AFD7ED558CCD)) ^ (a >> np.uint64(33))
        return a

    t0 = time.time()
    a = np.arange(64_000_000, dtype=np.uint64)  # 512 MB first-touch
    a = fold(a)
    cold = round(time.time() - t0, 3)
    t0 = time.time()
    a = fold(a)
    warm = round(time.time() - t0, 3)
    checksum = int(a[::1_000_000].sum()) & 0xFFFFFFFF
    del a
    return {"cold_s": cold, "warm_s": warm, "checksum": checksum}


# Queries whose first in-suite wall builds a session cache (verify edge DAG /
# pair-set localCheckpoint) that later runs reuse: runs[0] is the cache-BUILD
# cost, min is the warm cost. The sidecar splits them explicitly (VERDICT r4
# item 10) so the headline's first-run semantics stay transparent.
SESSION_CACHED = {
    "near_dup_pairs_docs", "near_dup_clusters_docs", "cluster_cohesion_docs",
    "char_ngram_dup_pairs_docs", "containment_dup_pairs_docs",
    "embedding_near_dup_pairs", "cluster_representatives_docs",
    "dedup_skew_report_docs", "threshold_sweep_docs", "cluster_assign_docs",
    "method_agreement_docs", "dedup_rewrite_docs", "dedup_growth_curve_docs",
    "source_dedup_report_docs", "dedup_locality_docs",
    "cross_source_dup_matrix_docs",
}


def run_pipeline(spark, corpus_path: str) -> dict:
    from minhash_spark.config import MinHashConfig
    from minhash_spark.plans.pipeline import DedupPipeline
    from minhash_spark.sources.io import TableIO

    cfg = MinHashConfig(
        seed=0,
        size=128,
        bit=1,
        scheme=os.environ.get("SPARK_GRAFT_SCHEME", "kseed"),
        tokenizer="char_shingle",
        tokenizer_params={"k": 9},
        verify_threshold=0.8,
        filter_common_shingles=True,
        common_sample_docs=20000,
    )
    ckpt = f"/tmp/minhash_bench_ckpt_{os.getpid()}"
    shutil.rmtree(ckpt, ignore_errors=True)
    files = spark.read.parquet(corpus_path)
    n_files = files.count()
    # warmup: one full untimed pipeline run first. This sandbox serializes
    # page-fault handling globally (~400 MB/s aggregate first-touch across
    # ALL processes), so a cold fleet of Python workers measures the sandbox,
    # not the engine; the measured run executes on fully-warm reused worker
    # heaps, which is the steady state of a long-lived cluster. Disclosed in
    # BENCH/BASELINE.md.
    warm_ckpt = ckpt + "_warm"
    shutil.rmtree(warm_ckpt, ignore_errors=True)
    DedupPipeline(spark, TableIO(warm_ckpt), cfg).run(files).count()
    shutil.rmtree(warm_ckpt, ignore_errors=True)
    # min of N measured runs (default 3): this sandbox's timing noise is
    # +-50% on identical stages; the minimum is the least-contaminated
    # estimate. SPARK_GRAFT_BENCH_RUNS trims very long low-core legs.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", 3))
    best_wall, best_stage_walls, n_out = None, {}, 0
    walls = []
    for _rep in range(n_runs):
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.time()
        pipe = DedupPipeline(spark, TableIO(ckpt), cfg)
        out = pipe.run(files)
        wall = time.time() - t0
        walls.append(round(wall, 2))
        io = TableIO(ckpt)
        n_out = io.manifest("clusters_all")["rows"]
        if best_wall is None or wall < best_wall:
            best_wall = wall
            best_stage_walls = {
                st: io.manifest(st)["wall_s"]
                for st in ("common_shingles", "signatures", "edges", "clusters", "clusters_all")
                if io.manifest(st)
            }
    n_clusters = spark.read.parquet(os.path.join(ckpt, "clusters")).select(
        "cluster_id"
    ).distinct().count()
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "wall_s": round(best_wall, 2),
        "files": n_files,
        "files_per_sec": round(n_files / best_wall, 1),
        "rows_out": n_out,
        "clusters": n_clusters,
        "stage_walls": best_stage_walls,
        "scheme": cfg.scheme,
        "runs": n_runs,
        "walls": walls,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    pipeline_only = "--pipeline-only" in sys.argv

    from minhash_spark.session import build_session

    canary = vm_canary()

    spark = build_session(app_name="minhash-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = ensure_bench_corpus(spark)

    if pipeline_only:
        res = run_pipeline(spark, corpus_path)
        res["cpus"] = int(cpus)
        res["canary"] = canary
        print(json.dumps(res))
        spark.stop()
        return

    from minhash_spark.plans import queries as Q

    # per-query: N in-process runs (default 2), recorded as
    # {"min": best_wall, "runs": [w1, w2, ...]}. The sandbox's timing noise
    # is +-50% on identical stages, so a single-shot wall is not comparable
    # round-to-round; min-of-N plus the raw walls makes any outlier
    # diagnosable from the artifact alone. Caveat the artifact reader can see
    # directly: queries backed by the session edge caches / localCheckpoint
    # (near_dup_*, embedding_near_dup_*, cluster_*) run warm after their
    # first wall — w1 is the cold-in-suite-order cost, min is the warm rerun.
    # The headline "value" therefore sums FIRST-run walls (same semantics as
    # rounds 1-2); "value_min" sums the mins.
    n_query_runs = max(1, int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", 2)))
    timings: dict[str, dict] = {}

    def timed(name, fn):
        # noop sink, NOT .count(): count() lets Catalyst prune deterministic
        # UDF columns entirely (a signature query would time only the scan);
        # the noop write materializes every output column.
        walls = []
        for _ in range(n_query_runs):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        timings[name] = {"min": min(walls), "runs": walls}

    pipe_res = run_pipeline(spark, corpus_path)
    timings["dedup_pipeline_planted"] = {
        "min": pipe_res["wall_s"],
        "runs": pipe_res["walls"],
    }

    timed("near_dup_pairs_docs", lambda: Q.q_near_dup_pairs(spark, sf_dir))
    timed("near_dup_clusters_docs", lambda: Q.q_near_dup_clusters(spark, sf_dir))
    timed("cluster_cohesion_docs", lambda: Q.q_cluster_cohesion(spark, sf_dir))
    timed("char_ngram_dup_pairs_docs", lambda: Q.q_char_ngram_dup_pairs(spark, sf_dir))
    timed("containment_dup_pairs_docs", lambda: Q.q_containment_dup_pairs(spark, sf_dir))
    timed("exact_dup_clusters_docs", lambda: Q.q_exact_dup_clusters(spark, sf_dir))
    timed("minhash_signatures_docs", lambda: Q.q_minhash_signatures(spark, sf_dir))
    timed("simhash_pairs_docs", lambda: Q.q_simhash_near_dup_pairs(spark, sf_dir))
    timed("embedding_topk", lambda: Q.q_embedding_topk(spark, sf_dir))
    timed("embedding_ann_lsh", lambda: Q.q_embedding_ann_lsh(spark, sf_dir))
    timed("embedding_near_dup_pairs", lambda: Q.q_embedding_near_dup_pairs(spark, sf_dir))
    timed("quality_scores_docs", lambda: Q.q_quality_scores(spark, sf_dir))
    timed("token_counts_docs", lambda: Q.q_token_counts(spark, sf_dir))
    timed("vocab_docs", lambda: Q.q_vocab(spark, sf_dir))
    timed("cluster_representatives_docs", lambda: Q.q_cluster_representatives(spark, sf_dir))
    timed("event_sessions", lambda: Q.q_event_sessions(spark, sf_dir))
    timed("event_windowed_counts", lambda: Q.q_event_windowed_counts(spark, sf_dir))
    timed("doc_fingerprints_docs", lambda: Q.q_doc_fingerprints(spark, sf_dir))
    timed("multimodal_features_docs", lambda: Q.q_multimodal_features(spark, sf_dir))
    timed("clean_text_docs", lambda: Q.q_clean_text(spark, sf_dir))
    timed("multimodal_frames_docs", lambda: Q.q_multimodal_frames(spark, sf_dir))
    timed("code_stats_docs", lambda: Q.q_code_stats(spark, sf_dir))
    timed("secret_scan_docs", lambda: Q.q_secret_scan(spark, sf_dir))
    timed("license_scan_docs", lambda: Q.q_license_scan(spark, sf_dir))
    timed("source_overlap_docs", lambda: Q.q_source_overlap(spark, sf_dir))
    timed("stratified_sample_docs", lambda: Q.q_stratified_sample(spark, sf_dir))
    timed("leakage_safe_split_docs", lambda: Q.q_leakage_safe_split(spark, sf_dir))
    timed("source_dedup_report_docs", lambda: Q.q_source_dedup_report(spark, sf_dir))
    timed("dedup_skew_report_docs", lambda: Q.q_dedup_skew_report(spark, sf_dir))
    timed("pii_scan_docs", lambda: Q.q_pii_scan(spark, sf_dir))
    timed("event_funnel", lambda: Q.q_event_funnel(spark, sf_dir))
    timed("event_retention", lambda: Q.q_event_retention(spark, sf_dir))
    timed("event_props_rollup", lambda: Q.q_event_props_rollup(spark, sf_dir))
    timed("common_spans_docs", lambda: Q.q_common_spans(spark, sf_dir))
    timed("repetition_scores_docs", lambda: Q.q_repetition_scores(spark, sf_dir))
    timed("boilerplate_spans_docs", lambda: Q.q_boilerplate_spans(spark, sf_dir))
    timed("decontaminate_docs", lambda: Q.q_decontaminate(spark, sf_dir))
    timed("embedding_ann_ivf", lambda: Q.q_embedding_ann_ivf(spark, sf_dir))
    timed("fingerprint_matches_docs", lambda: Q.q_fingerprint_matches(spark, sf_dir))
    timed("passage_dedup_docs", lambda: Q.q_passage_dedup(spark, sf_dir))
    timed("tfidf_top_terms_docs", lambda: Q.q_tfidf_top_terms(spark, sf_dir))
    timed("lm_scores_docs", lambda: Q.q_lm_scores(spark, sf_dir))
    # round-4 additions (X50-X61) — excluded from the r3-comparable subtotal
    timed("shard_manifest_docs", lambda: Q.q_shard_manifest(spark, sf_dir))
    timed("dedup_rewrite_docs", lambda: Q.q_dedup_rewrite(spark, sf_dir))
    timed("word_entropy_docs", lambda: Q.q_word_entropy_scores(spark, sf_dir))
    timed("threshold_sweep_docs", lambda: Q.q_near_dup_threshold_sweep(spark, sf_dir))
    timed("quality_weighted_docs", lambda: Q.q_quality_weighted_sample(spark, sf_dir))
    timed("length_histogram_docs", lambda: Q.q_length_histogram(spark, sf_dir))
    timed("dedup_growth_curve_docs", lambda: Q.q_dedup_growth_curve(spark, sf_dir))
    timed("approx_profile_docs", lambda: Q.q_approx_corpus_profile(spark, sf_dir))
    timed("repeated_substring_docs", lambda: Q.q_repeated_substring_scores(spark, sf_dir))
    timed("cluster_assign_docs", lambda: Q.q_cluster_assign(spark, sf_dir))
    timed("method_agreement_docs", lambda: Q.q_dedup_method_agreement(spark, sf_dir))
    timed("zipf_fit_docs", lambda: Q.q_zipf_fit(spark, sf_dir))
    timed("compression_scores_docs", lambda: Q.q_compression_scores(spark, sf_dir))
    # round-5 additions — also excluded from the r3-comparable subtotal
    timed("minhash_bitstrings_docs", lambda: Q.q_minhash_bitstrings(spark, sf_dir))
    timed("ann_operating_curve", lambda: Q.q_ann_operating_curve(spark, sf_dir))
    timed("image_phash_dedup_docs", lambda: Q.q_image_phash_dedup(spark, sf_dir))
    timed("sequence_packing_docs", lambda: Q.q_sequence_packing(spark, sf_dir))
    timed("mixture_weights_docs", lambda: Q.q_mixture_weights(spark, sf_dir))
    timed("decontaminate_bloom_docs", lambda: Q.q_decontaminate_bloom(spark, sf_dir))
    timed("audio_fingerprint_docs", lambda: Q.q_audio_fingerprint_dedup(spark, sf_dir))
    timed("training_order_docs", lambda: Q.q_training_order(spark, sf_dir))
    timed("video_fingerprint_docs", lambda: Q.q_video_fingerprint_dedup(spark, sf_dir))
    timed("repo_signature_dedup_docs", lambda: Q.q_repo_signature_dedup(spark, sf_dir))
    timed("novelty_scores_docs", lambda: Q.q_novelty_scores(spark, sf_dir))
    timed("dedup_locality_docs", lambda: Q.q_dedup_locality(spark, sf_dir))
    timed("cross_source_dup_matrix_docs", lambda: Q.q_cross_source_dup_matrix(spark, sf_dir))
    timed("normalized_clones_docs", lambda: Q.q_normalized_clones(spark, sf_dir))
    timed("clone_forks_docs", lambda: Q.q_clone_forks(spark, sf_dir))
    timed("dup_graph_degree_docs", lambda: Q.q_dup_graph_degree(spark, sf_dir))
    timed("dedup_token_savings_docs", lambda: Q.q_dedup_token_savings(spark, sf_dir))
    timed("bpe_pair_stats_docs", lambda: Q.q_bpe_pair_stats(spark, sf_dir))

    # rounds 1-2 summed the pipeline's BEST-of-N wall (run_pipeline always
    # reported min), so the comparable "first-run" total keeps the pipeline
    # at its min and uses first runs only for the per-query legs
    total_first = round(
        sum(
            t["min"] if name == "dedup_pipeline_planted" else t["runs"][0]
            for name, t in timings.items()
        ),
        2,
    )
    total_min = round(sum(t["min"] for t in timings.values()), 2)
    # like-for-like round comparison: the suite GREW in rounds 4-5 (every
    # entry in post_r3 below), so the headline total is not comparable to
    # BENCH_r03 — this subtotal restricts to the round-3 query set
    post_r3 = {
        "shard_manifest_docs", "dedup_rewrite_docs", "word_entropy_docs",
        "threshold_sweep_docs", "quality_weighted_docs", "length_histogram_docs",
        "dedup_growth_curve_docs", "approx_profile_docs", "repeated_substring_docs",
        "cluster_assign_docs", "method_agreement_docs", "zipf_fit_docs",
        "compression_scores_docs",
        # round-5 additions
        "minhash_bitstrings_docs", "ann_operating_curve",
        "image_phash_dedup_docs", "sequence_packing_docs", "mixture_weights_docs",
        "decontaminate_bloom_docs", "audio_fingerprint_docs",
        "training_order_docs", "video_fingerprint_docs",
        "repo_signature_dedup_docs", "novelty_scores_docs",
        "dedup_locality_docs", "cross_source_dup_matrix_docs",
        "normalized_clones_docs", "clone_forks_docs",
        "dup_graph_degree_docs", "dedup_token_savings_docs",
        "bpe_pair_stats_docs",
    }
    total_first_r3cmp = round(
        sum(
            t["min"] if name == "dedup_pipeline_planted" else t["runs"][0]
            for name, t in timings.items()
            if name not in post_r3
        ),
        2,
    )
    # The driver records only the LAST 2000 chars of stdout and parses the
    # JSON line from that window — round 3's line carried per-query runs
    # arrays, grew past 2000 chars, and BENCH_r03.json landed with
    # parsed: null. The stdout line therefore stays on the documented
    # {"queries": {name: sec}} scalar contract (first-run wall, the
    # round-comparable number); the full per-run detail goes to a sidecar.
    # explicit cold-build vs warm split for session-cached queries (the
    # headline "value" sums first-run walls, which for these is cache build)
    for name in SESSION_CACHED:
        if name in timings:
            timings[name]["cold_build_s"] = timings[name]["runs"][0]
            timings[name]["warm_s"] = timings[name]["min"]
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total_first,
        "value_min": total_min,
        "value_r3_comparable": total_first_r3cmp,
        "unit": "sec",
        "query_runs_per_query": n_query_runs,
        "canary": canary,
        "queries": timings,
        "sf": sf_dir,
        "pipeline": pipe_res,
        "cpus": int(cpus),
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run_detail.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    line = {
        "metric": "headline_queries_total_wall",
        "value": total_first,
        "value_min": total_min,
        "value_r3_comparable": total_first_r3cmp,
        "unit": "sec",
        "queries": {
            name: (t["min"] if name == "dedup_pipeline_planted" else t["runs"][0])
            for name, t in timings.items()
        },
        "sf": sf_dir,
        "pipeline": {
            k: pipe_res[k]
            for k in ("wall_s", "files", "files_per_sec", "clusters", "scheme")
        },
        "cpus": int(cpus),
        "canary": canary,
        "detail": "BENCH/last_run_detail.json",
    }
    out = json.dumps(line)
    if len(out) > 1900:  # keep the whole line inside the driver's tail window
        line["queries"] = {
            k: v for k, v in sorted(line["queries"].items(), key=lambda x: -x[1])[:30]
        }
        line["queries_truncated_to_top30_by_wall"] = True
        out = json.dumps(line)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
