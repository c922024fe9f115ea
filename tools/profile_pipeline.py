"""Fine-grained action-by-action profile of the bench pipeline (diagnostic;
bench.py remains the frozen measurement contract).

Replicates DedupPipeline.run() step by step with a timer around EVERY Spark
action and TableIO publish, so the gap between the sum of stage manifest
walls and the end-to-end wall is attributable line by line.

Usage: python tools/profile_pipeline.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minhash_spark.session import build_session  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import numpy as np
    from pyspark.sql import functions as F

    from bench import ensure_bench_corpus
    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import window_doc_freq_frames
    from minhash_spark.operators import components, lsh, signatures, verify
    from minhash_spark.sources.io import TableIO, input_fingerprint

    spark = build_session(app_name="profile-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_bench_corpus(spark)
    cfg = MinHashConfig(
        seed=0, size=128, bit=1,
        scheme=os.environ.get("SPARK_GRAFT_SCHEME", "kseed"),
        tokenizer="char_shingle", tokenizer_params={"k": 9},
        verify_threshold=0.8, filter_common_shingles=True,
        common_sample_docs=20000,
    )
    files = spark.read.parquet(corpus)

    for rep in range(reps):
        ckpt = f"/tmp/minhash_profile_{os.getpid()}_{rep}"
        shutil.rmtree(ckpt, ignore_errors=True)
        io = TableIO(ckpt)
        chash = cfg.config_hash()
        print(f"--- rep {rep} ---")
        T0 = time.time()
        marks = []

        def t(label, fn):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            marks.append((label, dt))
            print(f"  {label:46s} {dt:7.2f} s")
            return out

        fp = t("input_fingerprint", lambda: input_fingerprint(files))

        # ---- common_shingles
        n = t("files.count", lambda: files.count())
        d = max(1, n // cfg.common_sample_docs)
        sample = files.where(F.pmod(F.abs(F.hash("content")), F.lit(d)) == 0)
        n_sample = t("sample.count", lambda: sample.count())
        thr = max(2, int(cfg.common_df_ratio * n_sample))
        dfreq = (
            sample.select("content")
            .mapInPandas(window_doc_freq_frames(cfg), "h long, df long")
            .groupBy("h").agg(F.sum("df").alias("df"))
            .where(F.col("df") >= thr)
            .orderBy(F.col("df").desc()).limit(cfg.common_max_shingles)
        )
        t("common write", lambda: io.write(dfreq, "common_shingles", chash, [], input_fp=fp))
        hot_df = io.read(spark, "common_shingles")
        hot = np.sort(np.array([r["h"] for r in t("hot collect", lambda: hot_df.collect())], dtype=np.int64))

        # ---- signatures
        with_id = signatures.with_identity(files)
        par = spark.sparkContext.defaultParallelism
        reps_df = signatures.distinct_contents(with_id, num_partitions=par)
        sigs_b = signatures.compute_signatures(reps_df, cfg, exclude_sorted=hot, spread=False)
        t("signatures write", lambda: io.write(sigs_b, "signatures", chash, ["common_shingles"], input_fp=fp))
        sigs = io.read(spark, "signatures")

        # ---- edges
        buckets = lsh.explode_buckets(sigs)
        sizes = t("bucket_stats barrier", lambda: verify.barrier(lsh.bucket_stats(buckets)))
        pairs, overflow = lsh.candidate_pairs(buckets, cfg.max_bucket_size, sizes=sizes)
        t("overflow agg.first", lambda: overflow.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("m")).first())
        contents = signatures.with_identity(files).select(F.col("file_id").alias("rep_id"), "content")

        # verify_pairs inline with timers
        sg = sigs.select("rep_id", "sig")
        from minhash_spark.functions.udfs import sig_bitmatch_udf
        bitmatch = sig_bitmatch_udf()
        est_min = cfg.verify_threshold - cfg.sig_prefilter_margin
        p_min = est_min * 0.5 + 0.5
        pairs_m = t("pairs barrier", lambda: verify.barrier(pairs))
        joined = pairs_m.join(
            sg.select(F.col("rep_id").alias("a_id"), F.col("sig").alias("sig_a")), "a_id"
        ).join(sg.select(F.col("rep_id").alias("b_id"), F.col("sig").alias("sig_b")), "b_id")
        survivors = t("survivors barrier", lambda: verify.barrier(
            joined.withColumn("bit_match", bitmatch(F.col("sig_a"), F.col("sig_b")))
            .where(F.col("bit_match") >= F.lit(p_min)).select("a_id", "b_id")))
        n_surv = t("survivors.count", lambda: survivors.count())
        print(f"    (n_surv={n_surv})")
        # rest of verify via public API on the already-materialized survivors:
        # monkey-profile by calling verify_pairs and timing the whole tail
        edges_df = verify.verify_pairs(pairs_m, sigs, contents, cfg, exclude_sorted=hot)
        t("edges write (incl. verify tail)", lambda: io.write(
            edges_df, "edges", chash, ["signatures"]))
        edges = io.read(spark, "edges")

        # ---- clusters
        e = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        comp = components.connected_components(e)
        singles = (
            sigs.select(F.col("rep_id").alias("node"))
            .join(comp.select("node"), "node", "left_anti")
            .withColumn("component", F.col("node"))
        )
        clusters_df = comp.unionByName(singles).select(
            F.col("node").alias("rep_id"), F.col("component").alias("cluster_id"))
        t("clusters write (incl. CC)", lambda: io.write(clusters_df, "clusters", chash, ["edges"]))
        clusters = io.read(spark, "clusters")

        # ---- clusters_all
        with_id2 = signatures.with_identity(files)
        rep_map = sigs.select("content_sha256", "rep_id").join(clusters, "rep_id")
        lhs = with_id2.select("file_id", "repo", "path", "commit", "lang", "content_sha256")
        rhs = rep_map.select(F.col("content_sha256").alias("rep_sha"), "cluster_id")
        out = lhs.join(rhs, lhs["content_sha256"].eqNullSafe(rhs["rep_sha"])).drop("rep_sha")
        t("clusters_all write", lambda: io.write(out, "clusters_all", chash, ["signatures", "clusters"]))

        total = time.time() - T0
        acc = sum(dt for _l, dt in marks)
        print(f"  TOTAL {total:.2f} s | accounted {acc:.2f} s | gap {total-acc:.2f} s")
        shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
