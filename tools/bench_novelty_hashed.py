"""String-span vs hashed-span novelty measurement (VERDICT r5 item 4):
q_novelty_scores is the heaviest honest-cost single query and its docstring
claims production replaces the 13-gram span string with its hash before the
corpus-span shuffle. This measures both modes of novelty_scores_frame at
sf0.1 with the noop sink (guide §1.4), interleaved min-of-N, and writes
BENCH/novelty_hashed.json. The declared query keeps string mode (the DuckDB
oracle must see identical keys); equality of the two modes' outputs is
pytest-pinned.

Usage: python tools/bench_novelty_hashed.py [--runs 3] [--sf /root/testdata/sf0.1]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from minhash_spark.plans import queries as Q
    from minhash_spark.session import build_session

    import bench

    spark = build_session(app_name="bench-novelty-hashed", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Q.load(spark, args.sf, "documents")

    walls = {"string": [], "hashed": []}
    for rep in range(args.runs + 1):  # rep 0 = warmup, interleaved A/B after
        for mode, hashed in (("string", False), ("hashed", True)):
            spark.sparkContext.setJobDescription(f"novelty-{mode}-rep{rep}")
            t0 = time.time()
            Q.novelty_scores_frame(docs, spans_hashed=hashed).write.format(
                "noop"
            ).mode("overwrite").save()
            if rep > 0:
                walls[mode].append(round(time.time() - t0, 3))

    out = {
        "metric": "novelty_string_vs_hashed_span_shuffle",
        "sf": args.sf,
        "cpus": int(args.cpus),
        "runs": args.runs,
        "string_mode": {"wall_s": min(walls["string"]), "walls": walls["string"]},
        "hashed_mode": {"wall_s": min(walls["hashed"]), "walls": walls["hashed"]},
        "canary": bench.vm_canary(),
    }
    with open(os.path.join(_ROOT, "BENCH", "novelty_hashed.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
