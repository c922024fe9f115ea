"""Regression tests for the local oracle gate's dtype-class comparison
(VERDICT r3 item 3): the driver's value hash stringifies cells, so a DuckDB
HUGEINT aggregate materializing as pandas float64 renders '126.0' vs Spark's
'126' — invisible to pure value comparison after float formatting, red at the
driver. The gate must flag an uncast integer sum() in oracle SQL locally."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracles import dtype_class, dtype_mismatches  # noqa: E402


def test_uncast_hugeint_sum_is_flagged():
    """The exact source_rollup failure class: sum(len(...)) without ::BIGINT
    comes back HUGEINT -> pandas float64 while Spark emits int64."""
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT unnest([1,2,3]) AS x")
    uncast = con.sql("SELECT sum(x) AS total FROM t").df()
    cast = con.sql("SELECT sum(x)::BIGINT AS total FROM t").df()
    spark_like = pd.DataFrame({"total": pd.array([6], dtype="int64")})
    # HUGEINT must land in a non-int pandas dtype for this test to be live
    assert dtype_class(uncast["total"].dtype) != "int", uncast.dtypes
    assert dtype_mismatches(spark_like, uncast), (spark_like.dtypes, uncast.dtypes)
    assert not dtype_mismatches(spark_like, cast)


def test_dtype_class_families():
    assert dtype_class("int64") == "int"
    assert dtype_class("int32") == "int"
    assert dtype_class("float64") == "float"
    assert dtype_class("object") == "other"
    # int32-vs-int64 width differences are NOT flagged (same class)
    a = pd.DataFrame({"c": pd.array([1], dtype="int32")})
    b = pd.DataFrame({"c": pd.array([1], dtype="int64")})
    assert not dtype_mismatches(a, b)
    # string/object columns never false-positive against numerics via 'other'
    c = pd.DataFrame({"c": ["x"]})
    assert not dtype_mismatches(c, b)


def test_never_driver_checked_queries_sit_inside_the_window():
    """The driver's correctness gate evaluates only the FIRST 50 queries()
    entries. Mechanical guard for the ordering discipline: every entry that
    has never earned a driver row (green hash, or a rows-only record for
    no-oracle entries) in any CORRECTNESS_r*.json must sit inside the
    window; only driver-proven entries may rotate past it. A red row
    (hash_match=false) is NOT evidence — the entry stays in the window
    until it greens."""
    import glob
    import json

    root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    import __spark_entry__ as E

    names = list(E.queries())
    covered: set[str] = set()
    for f in glob.glob(str(root / "CORRECTNESS_r*.json")):
        for k, v in json.load(open(f)).items():
            if v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            ):
                covered.add(k)
    stragglers = [
        (i, n) for i, n in enumerate(names) if n not in covered and i >= 50
    ]
    assert not stragglers, (
        f"queries with no driver evidence outside the 50-entry window: {stragglers}"
    )


def test_stale_driver_evidence_rotates_back_into_the_window():
    """Freshness discipline (VERDICT r4 item 1): with >50 queries the window
    must alternate cohorts so no entry's newest driver row is ever more than
    one round old. Mechanically: let R be the newest CORRECTNESS round on
    disk; any entry whose newest green/rows-only row is from a round < R is
    already one round stale and MUST sit inside the first-50 window now, so
    the upcoming driver run refreshes it before it goes two rounds stale."""
    import glob
    import json
    import re

    root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    import __spark_entry__ as E

    names = list(E.queries())
    latest: dict[str, int] = {}
    rounds = []
    for f in glob.glob(str(root / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", Path(f).name).group(1))
        rounds.append(rnd)
        for k, v in json.load(open(f)).items():
            if v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            ):
                latest[k] = max(latest.get(k, 0), rnd)
    if not rounds:
        return
    newest = max(rounds)
    stale_outside = [
        (i, n, latest[n])
        for i, n in enumerate(names)
        if i >= 50 and n in latest and latest[n] < newest
    ]
    assert not stale_outside, (
        f"entries whose newest driver row predates round {newest} must be "
        f"inside the 50-entry window: {stale_outside}"
    )
