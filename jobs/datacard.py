"""Corpus data-card CLI: run the profiling query suite over a documents
table and emit one JSON report — the artifact a corpus owner attaches to a
training-data release (shard manifests, length distribution, unique-content
growth, per-source sketch profile, quality-tier mix).

Example:
    python jobs/datacard.py --sf-dir /root/testdata/sf0.01
    python jobs/datacard.py --sf-dir ... --out card.json --cpus 8

Every section is a bounded-size aggregate (shards, buckets, quarters,
sources, tiers, one Zipf row — never per-document rows), so the report stays
KB-sized at any corpus scale; the underlying queries are the driver-gated
X50/X55/X56/X57/X54/X61 operators (one partial-agg shuffle each, sketches
where exactness would cost a corpus-wide distinct)."""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def build_profile(spark, sf_dir: str, dedup_cards: bool = False) -> dict:
    from pyspark.sql import functions as F

    from minhash_spark.plans import queries as Q

    def rows(df, order):
        return [r.asDict() for r in df.orderBy(*order).collect()]

    shards = rows(Q.q_shard_manifest(spark, sf_dir), ["shard"])
    lengths = rows(Q.q_length_histogram(spark, sf_dir), ["len_bucket"])
    growth = rows(Q.q_dedup_growth_curve(spark, sf_dir), ["quarter"])
    sources = rows(Q.q_approx_corpus_profile(spark, sf_dir), ["source"])
    tier_mix = [
        r.asDict()
        for r in Q.q_quality_weighted_sample(spark, sf_dir)
        .groupBy("keep_permille")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("keep_permille")
        .collect()
    ]
    zipf = Q.q_zipf_fit(spark, sf_dir).collect()[0].asDict()
    dedup: dict = {}
    if dedup_cards:
        # opt-in: these three consume the verified near-dup edge DAG, so the
        # card's cost jumps from "a few partial-agg scans" to "one full
        # signature -> LSH -> verify pass" (cached across the three) — the
        # default card stays cheap, a release card pays for the dedup story
        dedup = {
            "token_savings": rows(Q.q_dedup_token_savings(spark, sf_dir), ["source"]),
            "dup_graph_degree": rows(Q.q_dup_graph_degree(spark, sf_dir), ["degree"]),
            "dup_locality": rows(Q.q_dedup_locality(spark, sf_dir), ["dist_digits"]),
        }
    return {
        "input": sf_dir,
        "n_docs": sum(s["n_docs"] for s in shards),
        "total_tokens": sum(s["total_tokens"] for s in shards),
        "total_chars": sum(s["total_chars"] for s in shards),
        "shards": shards,
        "length_histogram": lengths,
        "unique_content_growth": growth,
        "source_profiles": sources,
        "quality_tier_kept": tier_mix,
        "zipf": zipf,
        **({"dedup": dedup} if dedup else {}),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", required=True, help="directory with documents.parquet")
    ap.add_argument("--out", default=None, help="write JSON here (default stdout)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    ap.add_argument(
        "--dedup-cards",
        action="store_true",
        help="include the edge-DAG-backed cards (per-source token savings, "
        "dup-graph degree histogram, dup locality) — pays one full "
        "signature->LSH->verify pass, cached across the three",
    )
    args = ap.parse_args(argv)

    from minhash_spark.session import build_session

    spark = build_session(app_name="corpus-profile", master=f"local[{args.cpus}]")
    try:
        card = build_profile(spark, args.sf_dir, dedup_cards=args.dedup_cards)
    finally:
        spark.stop()
    text = json.dumps(card, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out} ({len(text)} bytes)")
    else:
        print(text)


if __name__ == "__main__":
    main()
