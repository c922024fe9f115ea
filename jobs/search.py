"""spark-submit entrypoint for signature similarity search over an indexed
signatures checkpoint — the reference's end-user QUERY flow (index documents
with a minhash field, then search by the query text's signature;
README.md:70-77 of codelibs/elasticsearch-minhash).

Example (after jobs/dedup.py has published <ckpt>/signatures):
    python jobs/search.py --checkpoints /data/dedup_ckpt \\
        --text "some file content ..." --top-k 10
    python jobs/search.py --checkpoints ... --text ... --exact   # term-query

Modes:
  * default: LSH-accelerated ranking — candidates are rows sharing >= 1 band
    key with the query (a scan-level ``arrays_overlap`` predicate — no
    shuffle, no full-corpus scoring), scored by signature bit-match
    (MinHash.compare semantics) with the inverted Jaccard estimate.
  * --brute: score every row (exact bit-match ranking, no LSH pruning).
  * --exact: the ES term-query analog — rows whose stored signature is
    byte-identical to the query's.

The query config MUST match index time (the signatures manifest's
config_hash is checked; --force overrides).
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
    p.add_argument("--checkpoints", required=True, help="dedup checkpoint root (needs signatures/)")
    p.add_argument("--text", required=True, help="query content")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--exact", action="store_true", help="term-query: byte-identical signatures")
    p.add_argument("--brute", action="store_true", help="score all rows (skip LSH band pruning)")
    p.add_argument("--force", action="store_true", help="skip config-hash check vs the index")
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p)
    args = p.parse_args()

    from minhash_spark import kernel
    from minhash_spark.functions.udfs import signature_for_text
    from minhash_spark.plans.search import search_signatures
    from minhash_spark.session import build_session
    from minhash_spark.sources.io import TableIO

    cfg = config_from_args(args)

    io = TableIO(args.checkpoints)
    m = io.manifest("signatures")
    if m is None:
        sys.exit("no signatures checkpoint under --checkpoints (run jobs/dedup.py first)")
    # gate on the SIGNATURE-relevant config only (kernel + banding): an index
    # built with a different --threshold or skew cap is still searchable —
    # those knobs never reach the stored bytes. Older manifests without
    # signature_hash fall back to the full config hash.
    idx_sig_hash = (m.get("metrics") or {}).get("signature_hash")
    mismatch = (
        idx_sig_hash != cfg.signature_hash()
        if idx_sig_hash is not None
        else m["config_hash"] != cfg.config_hash()
    )
    if mismatch and not args.force:
        sys.exit(
            f"query analyzer config (signature hash {cfg.signature_hash()}) does not match "
            f"the index ({idx_sig_hash or m['config_hash']}) — signatures are "
            "analyzer-dependent; pass the index-time flags, or --force"
        )

    qsig, qbands = signature_for_text(args.text, cfg)

    spark = build_session(app_name="minhash-search")
    spark.sparkContext.setLogLevel("ERROR")
    sigs = io.read(spark, "signatures")

    mode = "exact" if args.exact else ("brute" if args.brute else "lsh")
    hits = search_signatures(sigs, qsig, qbands, top_k=args.top_k, mode=mode, bit=cfg.bit)
    if mode == "exact":
        hits = hits.select("rep_id", "content_sha256", "sig_b64")
    rows = [r.asDict() for r in hits.collect()]

    print(json.dumps({"mode": mode, "query_sig_b64": kernel.to_base64(qsig), "hits": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
