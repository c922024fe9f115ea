"""VERDICT r3 item 4: every DOUBLE column a driver query emits must be
bit-stable across partition-count variations — float aggregation is
order-dependent, so a sum(double)-derived column would hash differently
between the sandbox gate and a 1000-executor run (and between driver rounds).
Every current double column is either an exact int/int division, a
round(..., k), or a per-row expression; this test enforces that property for
every FUTURE double column too, by diffing exact collected values at
shuffle.partitions=1 vs 32 for every queries() entry that emits a double."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"


def _double_cols(df):
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    ]


def test_double_columns_partition_invariant(spark):
    qs = E.queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    checked = []
    try:
        for name, fn in qs.items():
            # schema inspection is lazy — no job runs for skipped queries
            if not _double_cols(fn(spark, SF)):
                continue
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            a = sorted(repr(r) for r in fn(spark, SF).collect())
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            b = sorted(repr(r) for r in fn(spark, SF).collect())
            assert a == b, (
                f"{name}: double column(s) not partition-invariant — "
                f"derive them from exact integer arithmetic or round() "
                f"(first diff: {next((x, y) for x, y in zip(a, b) if x != y)})"
            )
            checked.append(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(checked) >= 15, checked  # the double-emitting suite is large
