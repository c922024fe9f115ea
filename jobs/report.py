"""Operational report over a dedup checkpoint: per-stage lineage (rows, wall,
skew, overflow metrics from the manifests — no Spark needed for these) plus a
cluster-size histogram and dedup ratios computed from the clusters table.

Example:
    python jobs/report.py --checkpoints /data/dedup_ckpt
    python jobs/report.py --checkpoints ... --no-spark   # manifests only
    python jobs/report.py --checkpoints today_ckpt --diff-against yday_ckpt

The manifest part reads _manifest.json files on the driver; the histogram
part runs one partial-agg Spark job over the clusters table (two-level
groupBy — same shape at 10^12 rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

# canonical order; any OTHER manifest-bearing stage dir (e.g. the curation
# pipeline's filtered/curated/decontaminated) is appended alphabetically so
# the report covers every checkpointed stage under the root
STAGES = (
    "filtered",
    "common_shingles",
    "signatures",
    "edges",
    "clusters",
    "clusters_all",
    "curated",
    "decontaminated",
)


def stage_summaries(io) -> list[dict]:
    extra = sorted(
        d
        for d in os.listdir(io.root)
        if d not in STAGES and io.manifest(d) is not None
    )
    out = []
    for name in STAGES + tuple(extra):
        m = io.manifest(name)
        if m is None:
            continue
        out.append(
            {
                "stage": name,
                "rows": m["rows"],
                "wall_s": m["wall_s"],
                "config_hash": m["config_hash"],
                "metrics": m.get("metrics", {}),
                "partition_stats": m.get("partition_stats", {}),
            }
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--no-spark", action="store_true", help="manifest summary only")
    p.add_argument("--top-sizes", type=int, default=10)
    p.add_argument(
        "--diff-against",
        default=None,
        metavar="PREV_CKPT",
        help="previous run's checkpoint root: adds a day-over-day cluster "
        "transition card (stable/grown/merged/new event counts, keyed by "
        "content_sha256 — operators/history.py cluster_diff)",
    )
    args = p.parse_args()

    from minhash_spark.sources.io import TableIO

    io = TableIO(args.checkpoints)
    report: dict = {"checkpoints": args.checkpoints, "stages": stage_summaries(io)}
    if not report["stages"]:
        sys.exit("no stage manifests under --checkpoints")

    if not args.no_spark:
        from pyspark.sql import functions as F

        from minhash_spark.session import build_session

        spark = build_session(app_name="minhash-report")
        spark.sparkContext.setLogLevel("ERROR")
        out = io.read(spark, "clusters_all")
        sizes = out.groupBy("cluster_id").agg(F.count("*").alias("n"))
        hist = (
            sizes.groupBy("n").agg(F.count("*").alias("n_clusters"))
            .orderBy(F.desc("n"))
            .limit(args.top_sizes)
            .collect()
        )
        n_files = out.count()
        n_clusters = sizes.count()
        report["dedup"] = {
            "n_files": n_files,
            "n_clusters": n_clusters,
            "kept_ratio": round(n_clusters / n_files, 6) if n_files else None,
            "size_histogram_top": [
                {"cluster_size": r["n"], "n_clusters": r["n_clusters"]} for r in hist
            ],
        }
        if args.diff_against:
            from minhash_spark.operators.history import cluster_diff

            prev = TableIO(args.diff_against).read(spark, "clusters_all")
            events = {
                r["event"]: int(r["n"])
                for r in cluster_diff(out, prev)
                .groupBy("event")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            report["cluster_diff_events"] = events
        spark.stop()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
