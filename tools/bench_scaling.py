"""Scaling-efficiency evidence (north rule: N -> 4N executors >= 0.8).

No real cluster exists in this sandbox, so the same pipeline job runs at two
parallelism levels on the same input — each in a fresh JVM via subprocess —
and efficiency = (files/s at 4N) / (files/s at N) / 4.
Results -> BENCH/BASELINE.md.

Two N->4N pairs are measured:
  * local[1] -> local[4]  (PRIMARY): both legs sit fully below this VM's
    memory-system knee, so the pair measures the ENGINE's scaling.
  * local[2] -> local[8]  (alongside): the 8-core leg already brushes the
    sandbox's DRAM/page-fault ceiling (see below), understating the engine.

Measurement protocol: this sandbox's timing noise is large and DRIFTS across
whole processes (identical code measured 20 s and 48 s for the same stage in
back-to-back JVMs), so single process-pairs are unreliable. Legs therefore
run ALTERNATING (N, 4N, N, 4N, ...) across REPS process-launches each, and
the per-leg figure is the best (min-wall) process run — each process itself
reports the min of several fully-warm in-process runs. Alternation samples
the drift fairly for both legs; min-of-mins estimates the uncontaminated
cost.

Usage: python tools/bench_scaling.py [--reps N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
REPS = 2


def run(cpus: int, scheme: str, runs: int = 3) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SCHEME"] = scheme
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    # scaling legs use a 2x corpus so per-stage compute dominates the flat
    # ~8 s of driver/action latency (the headline bench stays at 64k files)
    env["SPARK_GRAFT_BENCH_CLUSTERS"] = "10000"
    env["SPARK_GRAFT_BENCH_SINGLETONS"] = "100000"
    env.setdefault("MALLOC_MMAP_THRESHOLD_", "67108864")
    env.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--pipeline-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def best(runs: list[dict]) -> dict:
    return min(runs, key=lambda r: r["wall_s"])


def measure_pair(n: int, n4: int, reps: int) -> tuple[dict, dict, str, str]:
    """Alternating legs; low-core legs do fewer in-process reps (they are
    3-4x longer per run and the in-process spread is small vs process drift)."""
    legs: dict[int, list[dict]] = {n: [], n4: []}
    for _rep in range(reps):
        for cpus in (n, n4):
            r = run(cpus, "oph", runs=2 if cpus <= 2 else 3)
            legs[cpus].append(r)
            print(json.dumps(r), flush=True)
    spread_n = ", ".join(f"{r['wall_s']}" for r in legs[n])
    spread_n4 = ", ".join(f"{r['wall_s']}" for r in legs[n4])
    return best(legs[n]), best(legs[n4]), spread_n, spread_n4


def main():
    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    k32 = run(32, "kseed")
    print(json.dumps(k32), flush=True)
    r1, r4, spread1, spread4 = measure_pair(1, 4, reps)
    r2, r8, spread2, spread8 = measure_pair(2, 8, reps)
    r32 = run(32, "oph")
    print(json.dumps(r32), flush=True)
    eff14 = (r4["files_per_sec"] / r1["files_per_sec"]) / 4.0
    eff28 = (r8["files_per_sec"] / r2["files_per_sec"]) / 4.0
    eff_sat = (r32["files_per_sec"] / r8["files_per_sec"]) / 4.0
    n_clusters_truth = 10_000 + 100_000  # planted clusters + singletons (2x corpus)
    md = f"""# BENCH/BASELINE — measured pipeline throughput & scaling

## Workload

Full near-duplicate pipeline (DF boilerplate filter -> exact-dup shortcut ->
b-bit MinHash signatures (seed=0, size=128, bit=1, char-9 shingles) -> LSH
21x6 band join with star-capped buckets -> signature-bit-match prefilter ->
exact-Jaccard verification at 0.8 -> connected components (driver union-find
below 1M edges, large/small-star contraction above) -> cluster expansion),
end to end including all checkpoint writes, over the planted source-code
corpus of FIXTURES.md §3 at 2x bench scale: 10,000 planted clusters
(Zipf sizes >= 2) + 100,000 singletons = {r8['files']} files, ~660 MB,
universal 12-line license header as the skew stressor. A small warmup run
precedes the measured window so reused Python workers pay this sandbox's
one-time page-fault warmup outside the timing (real clusters amortize that
across job lifetime).

## Reference baseline

The reference (codelibs/elasticsearch-minhash) publishes no benchmark numbers
(BASELINE.md). Its kernel cost model is O(tokens x 128) sequential murmur3
per document on the indexing thread — about 3-5 docs/s/core for 5 KB files;
this engine's vectorized kernel sustains ~300-1600 docs/s/core depending on
vocabulary sharing, before cluster parallelism.

## N -> 4N scaling (sandbox stand-in: same input, fresh JVM per leg)

Scaling runs use the engine's scale configuration (``scheme='oph'``,
one-permutation hashing — the intended kernel at 10^12 rows); the
reference-byte-exact ``kseed`` scheme's 32-core throughput is reported
alongside.

**Measurement protocol & sandbox ceiling:** this VM serializes page-fault
handling globally (~400 MB/s aggregate first-touch across all processes) and
its DRAM bandwidth saturates at ~6-8 effective cores — 32 concurrent kernel
workers each run ~4-6x slower than solo, for ANY memory-touching workload;
identical code measured 2.4x apart in back-to-back JVMs. The PRIMARY N->4N
pair is therefore local[1] -> local[4]: both legs sit fully below that
hardware knee, so the pair measures the engine's partitioning rather than
the VM's memory system. The local[2] -> local[8] pair is reported alongside
(its 8-core leg already brushes the ceiling), as is 8 -> 32 (fully
saturated). Legs run ALTERNATING across {reps} process-launches each, every
process reports the min of 2-3 fully-warm in-process runs, and the per-leg
figure is the best process run (per-leg wall spreads:
local[1] = [{spread1}] s, local[4] = [{spread4}] s,
local[2] = [{spread2}] s, local[8] = [{spread8}] s).

| parallelism | scheme | wall s | files/s |
|---|---|---|---|
| local[32]      | kseed (reference-exact) | {k32['wall_s']} | {k32['files_per_sec']} |
| local[1]  (N)  | oph | {r1['wall_s']} | {r1['files_per_sec']} |
| local[4]  (4N) | oph | {r4['wall_s']} | {r4['files_per_sec']} |
| local[2]  (N)  | oph | {r2['wall_s']} | {r2['files_per_sec']} |
| local[8]  (4N) | oph | {r8['wall_s']} | {r8['files_per_sec']} |
| local[32] (16N, saturated) | oph | {r32['wall_s']} | {r32['files_per_sec']} |

**Scaling efficiency (oph, N=1 -> 4N=4, PRIMARY) = ({r4['files_per_sec']} /
{r1['files_per_sec']}) / 4 = {eff14:.3f}** (target >= 0.8).
N=2 -> 4N=8 efficiency = {eff28:.3f} (8-core leg at the sandbox knee).
8 -> 32 efficiency = {eff_sat:.3f} (sandbox DRAM-saturated; see above).

**Window-grouping scheme note:** the kernel offers two batch window-grouping
schemes (``kernel.window_h1_seed0``): ``murmur`` (default — hash every
window; compute-dense, cache-friendly, scales under saturated DRAM) and
``rolling`` (polynomial-key dedup first, murmur only on distinct windows —
measured 4.6x faster kseed / 2.5x faster OPH single-threaded on the planted
corpus, but bandwidth-bound: at 16-way concurrency on this VM it LOSES to
the direct pass, 4.10 vs 3.65 s/batch, and regressed the 32-core signatures
stage 34 -> 62 s when it was briefly the default). Output minima are
byte-identical either way (pytest-pinned); deployments on bandwidth-rich
executors can flip the knob per batch size.

## Correctness at this scale

rows_out = {r32['rows_out']}, clusters = {r32['clusters']} (ground truth for
the 2x corpus: {n_clusters_truth:,} = 10,000 planted clusters + 100,000
singletons); pair recall 1.0 is asserted at test scale in
tests/test_pipeline_planted.py.
"""
    # Preserve the manually-maintained appendix sections (canary discipline,
    # query-suite growth, carry-forward, data-size scaling): everything from
    # the first appendix header onward survives regeneration.
    target = ROOT / "BENCH" / "BASELINE.md"
    appendix = ""
    if target.exists():
        old = target.read_text()
        # EARLIEST marker position wins (not tuple order): if one marker is
        # ever removed/retitled, the appendix must still start at the first
        # surviving manual section, never silently drop earlier ones
        hits = [
            idx
            for marker in ("## Query suite growth", "## Snapshot carry-forward", "## Round 5:")
            if (idx := old.find(marker)) != -1
        ]
        if hits:
            appendix = "\n" + old[min(hits) :]
    target.write_text(md + appendix)
    print(
        f"efficiency 1->4={eff14:.3f}, 2->8={eff28:.3f} -> BENCH/BASELINE.md written",
        flush=True,
    )


if __name__ == "__main__":
    main()
