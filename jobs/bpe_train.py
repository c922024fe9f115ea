"""Train a BPE subword tokenizer on a documents table and emit the merge
list (+ optional per-doc token counts) — X83.

One corpus-wide word-count pass (partial-agg groupBy), a bounded
TakeOrdered vocabulary cap, a driver-side merge loop, and an Arrow-batched
encode UDF: the scale shape of real web-corpus tokenizer training
(see minhash_spark/operators/bpe.py).

Example:
    python jobs/bpe_train.py --sf-dir /root/testdata/sf0.01 --merges 200 \\
        --out merges.json
    python jobs/bpe_train.py --sf-dir ... --merges 200 --out merges.json \\
        --counts-out counts_parquet_dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", required=True, help="directory with documents.parquet")
    ap.add_argument("--merges", type=int, default=200, help="number of BPE merges")
    ap.add_argument("--max-vocab", type=int, default=None,
                    help="training-vocabulary cap (top words by count)")
    ap.add_argument("--out", required=True, help="write the merge list JSON here")
    ap.add_argument("--counts-out", default=None,
                    help="optionally write per-doc BPE token counts (parquet)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    args = ap.parse_args(argv)
    if args.max_vocab is not None and args.max_vocab <= 0:
        ap.error("--max-vocab must be positive")

    from minhash_spark.operators import bpe
    from minhash_spark.plans.queries import load
    from minhash_spark.session import build_session

    spark = build_session(app_name="bpe-train", master=f"local[{args.cpus}]")
    try:
        docs = load(spark, args.sf_dir, "documents")
        kw = {"max_vocab": args.max_vocab} if args.max_vocab is not None else {}
        merges = bpe.learn_bpe(docs, n_merges=args.merges, **kw)
        with open(args.out, "w") as f:
            json.dump(
                {
                    "n_merges": len(merges),
                    "word_re": bpe.WORD_RE,
                    "end_marker": bpe.END,
                    "merges": [list(m) for m in merges],
                },
                f,
                indent=1,
            )
        print(f"wrote {args.out} ({len(merges)} merges)")
        if args.counts_out:
            bpe.bpe_token_counts(docs, merges).write.mode("overwrite").parquet(
                args.counts_out
            )
            print(f"wrote {args.counts_out}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
