"""Capture .explain('formatted') output for named queries() entries into
plans/<tag>/<name>_<suffix>.txt (optimization-round evidence artifacts).

Usage: python tools/capture_plans.py <tag> <before|after> name1,name2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minhash_spark.session import build_session  # noqa: E402


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as E

    qs = E.queries()
    spark = build_session(app_name=f"plan-capture-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
