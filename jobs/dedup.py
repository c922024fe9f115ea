"""spark-submit entrypoint for the dedup pipeline (north rule: runs via
``spark-submit --py-files`` on a multi-executor cluster).

Example:
    python tools/make_pyfiles_zip.py                     # -> dist/minhash_spark.zip
    spark-submit --py-files dist/minhash_spark.zip \\
        jobs/dedup.py --input /data/files_parquet \\
        --checkpoints /data/dedup_ckpt \\
        --tokenizer char_shingle --shingle-k 9 \\
        --threshold 0.8 --filter-common-shingles

Input: parquet table with columns (repo, path, commit, lang, content)
(BASELINE.json input_hint; Iceberg sources plug in by swapping the read).
Output: ``clusters_all`` checkpoint table (file_id, repo, path, commit, lang,
content_sha256, cluster_id) plus per-stage lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable from any cwd without --py-files (plain `python jobs/dedup.py`);
# on a cluster, spark-submit --py-files dist/minhash_spark.zip takes over.
# PYTHONPATH (not just sys.path) so executor Python workers can unpickle the
# kernel UDFs too — they import minhash_spark on their own.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet (or iceberg) files table")
    p.add_argument("--checkpoints", required=True, help="root dir for stage checkpoints")
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p)
    p.add_argument(
        "--auto-bands",
        action="store_true",
        help="derive (num-bands, rows-per-band) from --threshold via the "
        "S-curve planner (steepest curve with candidate recall >= 0.99)",
    )
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-bucket-size", type=int, default=64)
    p.add_argument("--filter-common-shingles", action="store_true")
    p.add_argument("--common-df-ratio", type=float, default=0.5)
    p.add_argument(
        "--shards-out",
        type=int,
        default=0,
        help="also materialize the deduplicated (one representative per "
        "cluster) corpus as N balanced training shards",
    )
    p.add_argument("--shards-path", default=None, help="output dir for --shards-out")
    p.add_argument(
        "--heads",
        default=None,
        help="parquet (repo, commit) manifest of snapshot heads: restrict "
        "the input to files reachable from each repo's head commit "
        "(broadcast semi-join, operators/history.py select_snapshot) — the "
        "standard first step when the input table holds multiple commits",
    )
    p.add_argument(
        "--prev-checkpoints",
        default=None,
        help="checkpoint root of the PREVIOUS snapshot's run: its signatures "
        "table is carried forward for unchanged content (sha256-keyed), so "
        "the MinHash kernel runs only on the snapshot's content delta; its "
        "edges table is likewise carried when the previous run's edge_hash "
        "matches (LSH + verify run only on pairs touching the delta). "
        "Refused unless the previous run's signature_hash matches this "
        "config (bit-exactness gate) and --filter-common-shingles is off.",
    )
    args = p.parse_args()
    if args.shards_out and not args.shards_path:
        p.error("--shards-out requires --shards-path")

    from minhash_spark.plans.pipeline import DedupPipeline
    from minhash_spark.session import build_session
    from minhash_spark.sources.io import TableIO

    if args.auto_bands:
        from minhash_spark.config import suggest_bands

        args.num_bands, args.rows_per_band = suggest_bands(args.size, args.threshold)
    cfg = config_from_args(
        args,
        verify_threshold=args.threshold,
        max_bucket_size=args.max_bucket_size,
        filter_common_shingles=args.filter_common_shingles,
        common_df_ratio=args.common_df_ratio,
    )
    spark = build_session(app_name="minhash-dedup")
    files = spark.read.parquet(args.input)
    if args.heads:
        from minhash_spark.operators.history import select_snapshot

        files = select_snapshot(files, spark.read.parquet(args.heads))
    pipe = DedupPipeline(spark, TableIO(args.checkpoints), cfg)
    prev_sigs = None
    if args.prev_checkpoints:
        prev_io = TableIO(args.prev_checkpoints)
        m = prev_io.manifest(DedupPipeline.T_SIG)
        if m is None:
            p.error(f"--prev-checkpoints has no {DedupPipeline.T_SIG} manifest")
        prev_hash = (m.get("metrics") or {}).get("signature_hash")
        if prev_hash != cfg.signature_hash():
            p.error(
                "previous signatures were computed under a different "
                f"signature config ({prev_hash} != {cfg.signature_hash()}); "
                "carry-forward would not be bit-exact"
            )
        prev_sigs = prev_io.read(spark, DedupPipeline.T_SIG)
    # edge carry-forward: only when the previous edges manifest exists AND
    # recorded a matching edge_hash (older checkpoints predate the metric —
    # they fall back to signature-only carry, never to a wrong answer)
    prev_edges, prev_ehash = None, None
    if prev_sigs is not None:
        em = prev_io.manifest(DedupPipeline.T_EDGES)
        recorded = ((em or {}).get("metrics") or {}).get("edge_hash")
        if recorded == cfg.edge_hash():
            prev_edges = prev_io.read(spark, DedupPipeline.T_EDGES)
            prev_ehash = recorded
        elif em is not None:
            print(
                f"note: previous edges not carried (edge_hash {recorded} != "
                f"{cfg.edge_hash()}); signatures still carry forward",
                file=sys.stderr,
            )
    # the manifest hash rides along so the pipeline re-validates at its own
    # API boundary (ADVICE r4: not only this CLI enforces the invariant)
    out = pipe.run(
        files,
        prev_signatures=prev_sigs,
        prev_signature_hash=None if prev_sigs is None else prev_hash,
        prev_edges=prev_edges,
        prev_edge_hash=prev_ehash,
    )
    n = out.count()
    result = {
        "rows_out": n,
        "clusters": out.select("cluster_id").distinct().count(),
        "stages": [{"name": s.name, "skipped": s.skipped, "rows": s.rows} for s in pipe.stages],
        "config_hash": cfg.config_hash(),
    }
    if args.shards_out:
        from pyspark.sql import functions as F

        from minhash_spark.operators.signatures import with_identity
        from minhash_spark.sources.shards import write_training_shards

        # kept corpus: deterministic representative (min file_id) per cluster,
        # joined back to the source for content — then N balanced shards
        keep = out.groupBy("cluster_id").agg(F.min("file_id").alias("file_id"))
        kept = with_identity(files).join(keep.select("file_id"), "file_id")
        m = write_training_shards(kept, args.shards_path, args.shards_out, id_col="file_id")
        result["shards"] = {
            "path": args.shards_path,
            "n_shards": m["n_shards"],
            "rows": m["rows"],
            "balance": m["balance"],
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
