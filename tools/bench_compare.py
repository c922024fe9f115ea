"""Canary-normalized cross-round bench comparison (VERDICT r5 item 2,
implemented outside the frozen bench.py measurement contract).

Compares the current BENCH/last_run_detail.json per-query walls against a
prior round's BENCH_rNN.json (driver artifact), normalizing for sandbox
weather with BOTH canary signals, because this sandbox degrades in two
distinct modes that move different queries:

  * warm-canary drift (pure-CPU speed) — scales every query roughly
    uniformly;
  * cold-canary drift (first-touch page-fault rate; observed 1.7 s -> 8.9 s
    across boots on identical code) — hits allocation-heavy legs (Arrow
    batches, shuffle buffers, fresh worker heaps) while the warm canary
    reads 1.0x, so warm-only normalization mislabels a degraded boot as a
    code regression (19 false outliers observed on an identical tree).

A query lands in `outliers` only if it still exceeds the threshold under
the most generous weather correction (the cold-canary scaling; since
cold_scale >= warm_scale by construction, cold-normalized <= warm-
normalized for every query). Per-query rows carry raw, warm-normalized,
and cold-normalized ratios so the bracket is auditable.

Usage: python tools/bench_compare.py [BENCH_rNN.json] [threshold]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def prev_queries(prev_path: Path) -> tuple[dict, dict]:
    d = json.loads(prev_path.read_text())
    parsed = d.get("parsed") or d
    qs = {k: v for k, v in (parsed.get("queries") or {}).items() if isinstance(v, (int, float))}
    return qs, (parsed.get("canary") or {})


def compare(
    prev_q: dict, prev_canary: dict, cur_q: dict, cur_canary: dict, threshold: float
) -> dict:
    """Pure comparison core (unit-tested in tests/test_bench_compare.py)."""

    def ratio(key):
        p, c = prev_canary.get(key), cur_canary.get(key)
        return (c / p) if (c and p) else 1.0

    warm_scale = ratio("warm_s")
    # floor at warm_scale, NOT at 1.0: the cold bracket may never be more
    # generous than the pure-CPU drift (a healthy boot after a degraded
    # prior round must not hand every query a free cold discount), but it
    # must still scale BELOW 1.0 when the whole machine got faster — a
    # 1.0 floor would absorb any real regression up to threshold/warm_scale
    # whenever the current boot outruns the prior one (review finding)
    cold_scale = max(ratio("cold_s"), warm_scale)

    rows, outliers = {}, []
    for name, pv in sorted(prev_q.items()):
        cv = cur_q.get(name)
        if isinstance(cv, dict):
            cv = (cv.get("runs") or [cv.get("min")])[0]
        if not isinstance(cv, (int, float)) or not pv:
            continue
        raw = cv / pv
        norm_warm = raw / warm_scale if warm_scale else raw
        norm_cold = raw / cold_scale if cold_scale else raw
        rows[name] = {
            "prev_s": pv,
            "cur_s": cv,
            "raw_ratio": round(raw, 3),
            "normalized_ratio": round(norm_warm, 3),
            "cold_normalized_ratio": round(norm_cold, 3),
        }
        # cold_scale >= warm_scale, so norm_cold <= norm_warm: the cold-
        # normalized ratio alone is the binding (most generous) check
        if norm_cold >= threshold:
            outliers.append(name)
    return {
        "prev_canary": {k: prev_canary.get(k) for k in ("cold_s", "warm_s")},
        "cur_canary": {k: cur_canary.get(k) for k in ("cold_s", "warm_s")},
        "canary_scale": round(warm_scale, 3),
        "cold_canary_scale": round(cold_scale, 3),
        "threshold": threshold,
        "outliers": sorted(outliers, key=lambda n: -rows[n]["cold_normalized_ratio"]),
        "queries": rows,
    }


def main():
    prev_path = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "BENCH_r05.json"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    cur = json.loads((ROOT / "BENCH" / "last_run_detail.json").read_text())
    prev_q, prev_canary = prev_queries(prev_path)
    report = {
        "prev": str(prev_path.name),
        **compare(prev_q, prev_canary, cur["queries"], cur.get("canary") or {}, threshold),
    }
    out = ROOT / "BENCH" / "compare_vs_prev.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in ("prev", "canary_scale", "outliers")}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
