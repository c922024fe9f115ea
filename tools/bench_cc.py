"""Distributed connected-components cost evidence (VERDICT r4 item 6): the
large/small-star path is equivalence-pinned by pytest but its COST at scale
was assumed, not measured. This script builds the verified edge table of the
planted bench corpus (optionally scaled up), then solves CC twice — driver
union-find vs the distributed alternating-star contraction
(cc_driver_threshold=0) — recording wall, rounds-to-convergence, and output
equality. Writes BENCH/cc.json.

Usage: python tools/bench_cc.py [--cpus N] [--scale 2] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--scale", type=int, default=2, help="corpus multiple of the bench spec")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.operators import components
    from minhash_spark.plans.pipeline import DedupPipeline
    from minhash_spark.session import build_session
    from minhash_spark.sources.io import TableIO

    import bench

    spark = build_session(app_name="bench-cc", master=f"local[{args.cpus}]")

    # scaled planted corpus, cached like the bench corpus
    spec = dict(bench.CORPUS_SPEC)
    spec["n_clusters"] *= args.scale
    spec["n_singletons"] *= args.scale
    tag = f"corpus_b_{spec['n_clusters']}_{spec['n_singletons']}_{spec['seed']}"
    path = os.path.join(bench.BENCH_DATA, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from minhash_spark.sources.fixtures import corpus_b

        files, _, _ = corpus_b(**spec)
        os.makedirs(bench.BENCH_DATA, exist_ok=True)
        spark.createDataFrame(files).repartition(64).write.mode("overwrite").parquet(path)
    files = spark.read.parquet(path)

    # edges via the pipeline (checkpointed once — CC is what we measure)
    cfg = MinHashConfig(
        seed=0, size=128, bit=1, tokenizer="char_shingle",
        tokenizer_params={"k": 9}, verify_threshold=0.8,
    )
    ckpt = os.path.join(bench.BENCH_DATA, f"cc_edges_{tag}")
    pipe = DedupPipeline(spark, TableIO(ckpt), cfg)
    pipe.run(files).count()
    edges = (
        TableIO(ckpt)
        .read(spark, DedupPipeline.T_EDGES)
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    )
    n_edges = edges.count()

    def solve(driver_threshold, tag_):
        walls, stats = [], {}
        result = None
        for rep in range(args.runs + 1):  # +1 warmup
            stats = {}
            t0 = time.time()
            out = components.connected_components(
                edges, driver_threshold=driver_threshold, stats=stats
            )
            result = {(r["node"], r["component"]) for r in out.collect()}
            if rep > 0:
                walls.append(round(time.time() - t0, 2))
        return {"wall_s": min(walls), "walls": walls, **stats}, result

    driver, comp_driver = solve(10**9, "driver")
    dist, comp_dist = solve(0, "distributed")
    assert comp_driver == comp_dist, "CC paths disagree!"

    out = {
        "metric": "cc_driver_vs_distributed_wall",
        "corpus_files": files.count(),
        "n_edges": n_edges,
        "n_components": len({c for _, c in comp_driver}),
        "driver_union_find": driver,
        "distributed_star": dist,
        "outputs_identical": True,
        "canary": bench.vm_canary(),
        "cpus": int(args.cpus),
    }
    with open(os.path.join(_ROOT, "BENCH", "cc.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    # edges cache is corpus-keyed and reusable; leave it for reruns
    spark.stop()


if __name__ == "__main__":
    main()
