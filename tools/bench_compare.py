"""Canary-normalized cross-round bench comparison (VERDICT r5 item 2,
implemented outside the frozen bench.py measurement contract).

Compares the current BENCH/last_run_detail.json per-query walls against a
prior round's BENCH_rNN.json (driver artifact), scaling by the warm-canary
ratio so sandbox-weather drift reads as ~1.0x instead of a fake
regression. Emits a JSON report with per-query (prev, cur, raw_ratio,
normalized_ratio) and an `outliers` list (normalized ratio >= threshold).

Usage: python tools/bench_compare.py [BENCH_rNN.json] [threshold]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def prev_queries(prev_path: Path) -> tuple[dict, float | None]:
    d = json.loads(prev_path.read_text())
    parsed = d.get("parsed") or d
    qs = {k: v for k, v in (parsed.get("queries") or {}).items() if isinstance(v, (int, float))}
    canary = (parsed.get("canary") or {}).get("warm_s")
    return qs, canary


def main():
    prev_path = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "BENCH_r05.json"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    cur = json.loads((ROOT / "BENCH" / "last_run_detail.json").read_text())
    prev_q, prev_canary = prev_queries(prev_path)
    cur_canary = (cur.get("canary") or {}).get("warm_s")
    scale = (cur_canary / prev_canary) if (cur_canary and prev_canary) else 1.0

    rows, outliers = {}, []
    for name, pv in sorted(prev_q.items()):
        cv = cur["queries"].get(name)
        if isinstance(cv, dict):
            cv = (cv.get("runs") or [cv.get("min")])[0]
        if not isinstance(cv, (int, float)) or not pv:
            continue
        raw = cv / pv
        norm = raw / scale if scale else raw
        rows[name] = {
            "prev_s": pv,
            "cur_s": cv,
            "raw_ratio": round(raw, 3),
            "normalized_ratio": round(norm, 3),
        }
        if norm >= threshold:
            outliers.append(name)
    report = {
        "prev": str(prev_path.name),
        "prev_canary_warm_s": prev_canary,
        "cur_canary_warm_s": cur_canary,
        "canary_scale": round(scale, 3),
        "threshold": threshold,
        "outliers": sorted(outliers, key=lambda n: -rows[n]["normalized_ratio"]),
        "queries": rows,
    }
    out = ROOT / "BENCH" / "compare_vs_prev.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in ("prev", "canary_scale", "outliers")}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
