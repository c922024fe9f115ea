"""spark-submit entrypoint for the incremental (streaming) dedup path:
drain the backlog of new file batches from a landing directory, extend the
signature/edge state, and (optionally) refresh the clusters table — the
cron-style incremental ingest a production dedup service runs between full
pipeline rebuilds.

Example:
    python jobs/stream_dedup.py --landing /data/landing \\
        --state /data/dedup_state --checkpoint /data/stream_ckpt --clusters

Landing input: parquet files with columns (repo, path, commit, lang,
content) appended FLAT into --landing (the Structured Streaming file source
tracks processed files through --checkpoint; a restart resumes exactly).
State tables written under --state: signatures/, edges/ (both append,
per-batch idempotent) and clusters/ with --clusters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--landing", required=True, help="landing dir of new file batches (parquet)")
    p.add_argument("--state", required=True, help="state root (signatures/, edges/, clusters/)")
    p.add_argument("--checkpoint", required=True, help="Structured Streaming checkpoint dir")
    p.add_argument("--clusters", action="store_true", help="maintain the clusters table per batch")
    p.add_argument(
        "--curate",
        action="store_true",
        help="apply the curation filter + secret redaction per micro-batch "
        "(same rules as jobs/curate.py) before signing",
    )
    p.add_argument(
        "--license-allow",
        default=None,
        help="comma-separated license families to KEEP per micro-batch "
        "(same gate as jobs/curate.py); omit to disable",
    )
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p)
    p.add_argument("--threshold", type=float, default=0.8)
    args = p.parse_args()

    from minhash_spark.operators.curation import parse_license_allow
    from minhash_spark.session import build_session
    from minhash_spark.streaming.incremental import run_incremental_dedup

    cfg = config_from_args(args, verify_threshold=args.threshold)
    spark = build_session(app_name="minhash-stream-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    run_incremental_dedup(
        spark, args.landing, args.state, args.checkpoint, cfg,
        maintain_clusters=args.clusters, curate=args.curate,
        license_allow=parse_license_allow(args.license_allow),
    )

    summary = {"config_hash": cfg.config_hash()}
    for t in ("signatures", "edges") + (("clusters",) if args.clusters else ()):
        path = os.path.join(args.state, t)
        try:
            summary[t] = spark.read.parquet(path).count()
        except Exception:
            summary[t] = 0
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
