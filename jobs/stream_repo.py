"""spark-submit entrypoint for streaming repo-signature maintenance (X78):
drain the backlog of new file batches from a landing directory and fold each
into the per-repo MinHash sketch state — the collection-level complement of
jobs/stream_dedup.py, kept current in O(delta) by the union monoid
(minhash_spark/streaming/collections.py).

Example:
    python jobs/stream_repo.py --landing /data/landing \\
        --state /data/repo_state --checkpoint /data/repo_ckpt

Landing input: parquet files with columns (repo, path, commit, lang,
content) appended FLAT into --landing. State written under
--state/repo_sigs/: one row (repo, mins array<long>) per repo — the
mergeable raw-minima form (the b-bit packed signature is not mergeable;
see functions/udfs.minhash_mins_udf).
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
    p.add_argument("--state", required=True, help="state root (repo_sigs/)")
    p.add_argument("--checkpoint", required=True, help="Structured Streaming checkpoint dir")
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p)
    args = p.parse_args()

    from minhash_spark.session import build_session
    from minhash_spark.streaming.collections import (
        repo_signatures,
        run_repo_signature_stream,
    )

    cfg = config_from_args(args)
    spark = build_session(app_name="minhash-stream-repo")
    spark.sparkContext.setLogLevel("ERROR")
    run_repo_signature_stream(spark, args.landing, args.state, args.checkpoint, cfg)

    summary = {
        "config_hash": cfg.config_hash(),
        "repos": repo_signatures(spark, args.state).count(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
