"""spark-submit entrypoint for the incremental embedding near-dup path
(continuous SemDeDup): drain the backlog of new vector batches from a
landing directory, extend the vector/edge state, and (optionally) refresh
the clusters table.

Example:
    python jobs/stream_embed.py --landing /data/vec_landing \\
        --state /data/emb_state --checkpoint /data/emb_ckpt --clusters

Landing input: parquet files with columns (vec_id long,
embedding array<float>) appended FLAT into --landing (the file source
tracks processed files through --checkpoint; a restart resumes exactly).
State tables written under --state: vectors/, edges/ (both append,
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
    p.add_argument("--landing", required=True, help="landing dir of new vector batches (parquet)")
    p.add_argument("--state", required=True, help="state root (vectors/, edges/, clusters/)")
    p.add_argument("--checkpoint", required=True, help="Structured Streaming checkpoint dir")
    p.add_argument("--clusters", action="store_true", help="maintain the clusters table per batch")
    p.add_argument("--tau", type=float, default=0.45, help="exact-cosine accept threshold")
    p.add_argument("--dim", type=int, default=64, help="embedding dimensionality")
    p.add_argument(
        "--max-bucket-size",
        type=int,
        default=None,
        help="history-anchored star cap per LSH bucket (default: "
        "SPARK_GRAFT_EMB_STREAM_MAX_BUCKET or 2000)",
    )
    args = p.parse_args()

    from minhash_spark.session import build_session
    from minhash_spark.streaming.embeddings import (
        EMB_STREAM_MAX_BUCKET,
        run_incremental_embedding_dedup,
    )

    spark = build_session(app_name="minhash-stream-embed")
    spark.sparkContext.setLogLevel("ERROR")
    run_incremental_embedding_dedup(
        spark,
        args.landing,
        args.state,
        args.checkpoint,
        tau=args.tau,
        dim=args.dim,
        maintain_clusters=args.clusters,
        max_bucket_size=(
            args.max_bucket_size if args.max_bucket_size is not None else EMB_STREAM_MAX_BUCKET
        ),
    )

    summary = {"tau": args.tau}
    for t in ("vectors", "edges") + (("clusters",) if args.clusters else ()):
        path = os.path.join(args.state, t)
        try:
            summary[t] = spark.read.parquet(path).count()
        except Exception:
            summary[t] = 0
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
