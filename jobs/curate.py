"""spark-submit entrypoint for the full corpus-curation pipeline:
filter (code quality + secret redaction) → near-dup dedup → representative
selection → optional eval-set decontamination → optional training shards.

Example:
    python tools/make_pyfiles_zip.py
    spark-submit --py-files dist/minhash_spark.zip \\
        jobs/curate.py --input /data/files_parquet \\
        --checkpoints /data/curate_ckpt \\
        --eval /data/eval_parquet --shards-out 64 --shards-path /data/shards

Input: parquet table (repo, path, commit, lang, content); --eval: parquet
table with a ``content`` column. Prints a JSON stage report (rows per stage,
drop counts, contamination hits) from the TableIO manifests.
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
    p.add_argument("--input", required=True, help="parquet files table")
    p.add_argument("--checkpoints", required=True, help="root dir for stage checkpoints")
    p.add_argument("--eval", default=None, help="eval-set parquet (content column)")
    p.add_argument("--span-n", type=int, default=5, help="decontamination n-gram size")
    p.add_argument("--min-shared-spans", type=int, default=1)
    p.add_argument(
        "--decontam-bloom",
        action="store_true",
        help="use the Bloom-bitmap prefilter decontamination path (for eval "
        "span sets too large to broadcast exactly; identical output)",
    )
    p.add_argument("--shards-out", type=int, default=0)
    p.add_argument("--shards-path", default=None)
    p.add_argument(
        "--license-allow",
        default=None,
        help="comma-separated license families to KEEP (e.g. mit,apache,bsd); "
        "omit to disable the license gate",
    )
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-bucket-size", type=int, default=64)
    p.add_argument(
        "--collapse-forks",
        type=float,
        default=None,
        metavar="JACCARD",
        help="repo-level fork collapse before file rules: keep one "
        "representative repo per fork group (file-blob Jaccard >= JACCARD); "
        "dropped files get filter_reason='fork'",
    )
    args = p.parse_args()
    if args.shards_out and not args.shards_path:
        p.error("--shards-out requires --shards-path")

    from minhash_spark.operators.curation import parse_license_allow
    from minhash_spark.plans.curate import CurationPipeline
    from minhash_spark.session import build_session
    from minhash_spark.sources.io import TableIO

    cfg = config_from_args(
        args,
        verify_threshold=args.threshold,
        max_bucket_size=args.max_bucket_size,
    )
    spark = build_session(app_name="curate")
    files = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval) if args.eval else None

    io = TableIO(args.checkpoints)
    pipe = CurationPipeline(
        spark,
        io,
        cfg,
        span_n=args.span_n,
        min_shared_spans=args.min_shared_spans,
        license_allow=parse_license_allow(args.license_allow),
        fork_collapse_min_jaccard=args.collapse_forks,
        decontam_mode="bloom" if args.decontam_bloom else "broadcast",
    )
    final = pipe.run_curation(files, eval_files=eval_df)

    if args.shards_out:
        from minhash_spark.sources.shards import write_training_shards

        write_training_shards(
            final, args.shards_path, args.shards_out, id_col="file_id"
        )

    report = {
        "stages": [
            {
                "name": s.name,
                "skipped": s.skipped,
                "rows": s.rows,
                "metrics": (io.manifest(s.name) or {}).get("metrics", {}),
            }
            for s in pipe.stages
        ],
        "final_rows": (io.manifest(pipe.stages[-1].name) or {}).get("rows"),
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
