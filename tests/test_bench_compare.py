"""The dual-canary bench comparator (tools/bench_compare.py).

This sandbox degrades in two independent modes measured by the bench's VM
canary: warm-canary drift (pure-CPU speed, scales all queries uniformly)
and cold-canary drift (first-touch page-fault rate, hits allocation-heavy
queries while the warm canary reads 1.0x). A query is a real-regression
suspect only if it exceeds the threshold under BOTH normalizations.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from bench_compare import compare  # noqa: E402


PREV_CANARY = {"cold_s": 1.7, "warm_s": 1.15}


def test_uniform_warm_drift_is_not_a_regression():
    # whole VM 2x slower on pure CPU: warm canary doubles, every query
    # doubles -> normalized 1.0, no outliers
    prev = {"q1": 1.0, "q2": 2.0}
    cur = {"q1": 2.0, "q2": 4.0}
    rep = compare(prev, PREV_CANARY, cur, {"cold_s": 3.4, "warm_s": 2.3}, 1.3)
    assert rep["outliers"] == []
    assert rep["queries"]["q1"]["normalized_ratio"] == 1.0


def test_cold_only_degradation_brackets_alloc_heavy_queries():
    # page-fault regime 5x slower (cold canary 1.7 -> 8.5), warm unchanged:
    # an alloc-heavy query at 4x raw must NOT be flagged (cold-normalized
    # 0.8 < threshold) even though warm-normalized reads 4x
    prev = {"alloc_heavy": 1.0, "steady": 1.0}
    cur = {"alloc_heavy": 4.0, "steady": 1.05}
    rep = compare(prev, PREV_CANARY, cur, {"cold_s": 8.5, "warm_s": 1.15}, 1.3)
    assert rep["outliers"] == []
    row = rep["queries"]["alloc_heavy"]
    assert row["normalized_ratio"] == 4.0
    assert row["cold_normalized_ratio"] < 1.3


def test_real_regression_flagged_under_both_scalings():
    # identical canaries, one query 2x slower: regressed under any weather
    # correction -> flagged
    prev = {"q1": 1.0, "q2": 1.0}
    cur = {"q1": 2.0, "q2": 1.0}
    rep = compare(prev, PREV_CANARY, cur, dict(PREV_CANARY), 1.3)
    assert rep["outliers"] == ["q1"]


def test_faster_cold_canary_never_scales_below_raw():
    # current boot HEALTHIER than the prior round's (cold 1.7 -> 0.9):
    # scaling by the raw cold ratio would inflate every query 1.9x and
    # flag honest same-speed runs; the floor keeps normalized == raw
    prev = {"q1": 1.0}
    cur = {"q1": 1.0}
    rep = compare(prev, PREV_CANARY, cur, {"cold_s": 0.9, "warm_s": 1.15}, 1.3)
    assert rep["outliers"] == []
    assert rep["queries"]["q1"]["cold_normalized_ratio"] == 1.0


def test_first_run_extracted_from_detail_dicts():
    # BENCH/last_run_detail.json stores per-query dicts; the comparator
    # reads the FIRST run (headline semantics), not the min
    prev = {"q1": 1.0}
    cur = {"q1": {"min": 0.1, "runs": [1.2, 0.1]}}
    rep = compare(prev, PREV_CANARY, cur, dict(PREV_CANARY), 1.3)
    assert rep["queries"]["q1"]["raw_ratio"] == 1.2


def test_regression_not_absorbed_by_a_faster_current_boot():
    # prior round benched on a DEGRADED boot (warm 2.3), current on a
    # healthy one (warm 1.15): warm_scale = 0.5. A query whose code got
    # 2x slower measures raw_ratio 1.0 — the old 1.0 floor on cold_scale
    # normalized it to 1.0 and silently passed it; flooring at warm_scale
    # restores the flag (1.0 / 0.5 = 2.0 >= threshold)
    prev_canary = {"cold_s": 3.4, "warm_s": 2.3}
    cur_canary = {"cold_s": 1.7, "warm_s": 1.15}
    prev = {"regressed": 2.0, "honest": 2.0}
    cur = {"regressed": 2.0, "honest": 1.0}  # honest got 2x faster with the VM
    rep = compare(prev, prev_canary, cur, cur_canary, 1.3)
    assert rep["outliers"] == ["regressed"]
    assert rep["queries"]["honest"]["cold_normalized_ratio"] == 1.0


def test_healthy_boot_after_degraded_prior_does_not_discount_cold():
    # prior round's COLD canary was degraded (8.0) with warm healthy;
    # current boot fully healthy: cold ratio 0.21 must not become the
    # scale (it would flag honest same-speed runs) — warm_scale (1.0)
    # floors it
    prev_canary = {"cold_s": 8.0, "warm_s": 1.15}
    cur_canary = {"cold_s": 1.7, "warm_s": 1.15}
    prev = {"q1": 1.0}
    cur = {"q1": 1.0}
    rep = compare(prev, prev_canary, cur, cur_canary, 1.3)
    assert rep["outliers"] == []
    assert rep["queries"]["q1"]["cold_normalized_ratio"] == 1.0
