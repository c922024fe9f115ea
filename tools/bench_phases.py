"""Per-phase wall-clock breakdown of the bench pipeline + selected queries
(guide §1: isolate computation with the noop sink, label jobs).

Usage:
  python tools/bench_phases.py pipeline      # stage-by-stage pipeline walls
  python tools/bench_phases.py query NAME [N]  # N timed noop runs of a query

Writes human-readable timings to stdout; purely diagnostic (bench.py stays
the frozen measurement contract).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minhash_spark.session import build_session  # noqa: E402


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label:42s} {time.time() - t0:7.2f} s")
    return out


def pipeline_breakdown():
    import shutil

    from bench import CORPUS_SPEC, ensure_bench_corpus  # noqa: F401
    from minhash_spark.config import MinHashConfig
    from minhash_spark.plans.pipeline import DedupPipeline
    from minhash_spark.sources.io import TableIO

    spark = build_session(app_name="bench-phases")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_bench_corpus(spark)
    cfg = MinHashConfig(
        seed=0, size=128, bit=1, scheme=os.environ.get("SPARK_GRAFT_SCHEME", "kseed"),
        tokenizer="char_shingle", tokenizer_params={"k": 9},
        verify_threshold=0.8, filter_common_shingles=True, common_sample_docs=20000,
    )
    files = spark.read.parquet(corpus)
    files.count()
    for rep in range(int(os.environ.get("PHASE_REPS", "2"))):
        ckpt = f"/tmp/minhash_phase_ckpt_{os.getpid()}_{rep}"
        shutil.rmtree(ckpt, ignore_errors=True)
        io = TableIO(ckpt)
        pipe = DedupPipeline(spark, io, cfg)
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"pipeline rep{rep}")
        out = pipe.run(files)
        wall = time.time() - t0
        print(f"rep{rep}: total {wall:.2f} s")
        for st in ("common_shingles", "signatures", "edges", "clusters", "clusters_all"):
            m = io.manifest(st)
            if m:
                print(f"  {st:20s} manifest wall {m['wall_s']:7.2f} s rows={m['rows']}")
        shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


def query_timing(name: str, n: int):
    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="bench-phases-q")
    spark.sparkContext.setLogLevel("ERROR")
    fn = E.queries()[name]
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t(f"{name} run{i}", lambda: fn(spark, sf_dir).write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "pipeline":
        pipeline_breakdown()
    else:
        query_timing(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
