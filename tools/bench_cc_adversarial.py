"""Adversarial-topology CC benchmark (VERDICT r5 item 5): BENCH/cc.json
measures the distributed large/small-star path on the pipeline's BENIGN edge
set (9,927 small components, 2 rounds). This script stresses the two
topologies that are worst-case for alternating star contraction and proves
convergence + output identity there:

  * chain   — one path graph of N nodes: maximum diameter, the case where a
              naive label-propagation CC needs O(N) rounds; star contraction
              must converge in O(log N).
  * megastar — one hub with N spokes PLUS a long chain welded to the hub:
              maximum skew (the hub's star groups hold almost every edge)
              combined with depth.

Both are solved with cc_driver_threshold=0 (forced distributed) and with the
driver union-find, asserting identical components. Writes
BENCH/cc_adversarial.json.

Usage: python tools/bench_cc_adversarial.py [--nodes 200000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from minhash_spark.operators import components
    from minhash_spark.session import build_session

    import bench

    spark = build_session(app_name="bench-cc-adversarial", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.nodes

    def chain_edges():
        # path graph 0-1-2-...-(n-1): diameter n-1
        return spark.range(n - 1).select(
            F.col("id").alias("u"), (F.col("id") + 1).alias("v")
        )

    def megastar_edges():
        # hub 0 with spokes 1..n/2 (maximum star skew), welded to a chain
        # n/2..n-1 (depth on top of skew). One range projection — unioning
        # two same-lineage spark.range frames trips a Spark 4.1 optimizer
        # bug (NoSuchElementException: key not found) under localCheckpoint.
        half = n // 2
        return spark.range(1, n).select(
            F.when(F.col("id") <= half, F.lit(0).cast("long"))
            .otherwise(F.col("id") - 1)
            .alias("u"),
            F.col("id").alias("v"),
        )

    report = {
        "metric": "cc_adversarial_topologies",
        "n_nodes": n,
        "cpus": int(args.cpus),
        "topologies": {},
        "canary": bench.vm_canary(),
    }
    for name, builder in (("chain", chain_edges), ("megastar", megastar_edges)):
        edges = builder()
        results = {}
        comps = {}
        for path_name, thr in (("driver_union_find", 10**12), ("distributed_star", 0)):
            walls, stats = [], {}
            comp = None
            for rep in range(args.runs + 1):  # +1 warmup
                stats = {}
                t0 = time.time()
                out = components.connected_components(
                    edges, driver_threshold=thr, stats=stats
                )
                comp = {(r["node"], r["component"]) for r in out.collect()}
                if rep > 0:
                    walls.append(round(time.time() - t0, 2))
            results[path_name] = {"wall_s": min(walls), "walls": walls, **stats}
            comps[path_name] = comp
        identical = comps["driver_union_find"] == comps["distributed_star"]
        assert identical, f"{name}: CC paths disagree!"
        n_comp = len({c for _, c in comps["driver_union_find"]})
        assert n_comp == 1, f"{name}: expected ONE component, got {n_comp}"
        results["outputs_identical"] = True
        results["n_components"] = n_comp
        report["topologies"][name] = results
        print(f"{name}: distributed rounds={results['distributed_star'].get('rounds')} "
              f"wall={results['distributed_star']['wall_s']}s "
              f"(driver {results['driver_union_find']['wall_s']}s), outputs identical")

    with open(os.path.join(_ROOT, "BENCH", "cc_adversarial.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("metric", "n_nodes")}))
    spark.stop()


if __name__ == "__main__":
    main()
