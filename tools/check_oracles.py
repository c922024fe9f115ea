"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and (when present) its oracle_sql() in DuckDB over the same parquet
tables; compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from minhash_spark.session import build_session  # noqa: E402


def dtype_class(dt) -> str:
    """Coarse numeric class of a pandas dtype: 'int', 'float', or 'other'.

    The driver's value hash stringifies cell values, so a DuckDB HUGEINT sum
    that pandas materializes as float64 renders '126.0' while Spark's int64
    renders '126' — a hash mismatch invisible to pure value comparison after
    float formatting. Comparing dtype classes per column catches an uncast
    integer aggregate in oracle_sql() locally (VERDICT r3 item 3)."""
    s = str(dt)
    if "int" in s.lower():
        return "int"
    if "float" in s.lower() or "double" in s.lower() or "decimal" in s.lower():
        return "float"
    return "other"


def dtype_mismatches(sdf, od):
    """Columns whose numeric class differs between Spark and DuckDB frames."""
    bad = []
    for c in sdf.columns:
        if c in od.columns:
            a, b = dtype_class(sdf[c].dtype), dtype_class(od[c].dtype)
            if a != b and "other" not in (a, b):
                bad.append((c, str(sdf[c].dtype), str(od[c].dtype)))
    return bad


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E

    spark = build_session(app_name="oracle-check")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    if len(sys.argv) > 2:  # optional comma-separated query-name filter
        only = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        sdf = df.toPandas()
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"  {name:28s} rows={len(sdf)} cols={scols}  (rows-only)")
            if len(sdf) == 0 and name not in ("exact_dup_pairs",):
                print(f"    WARNING: empty result")
            continue
        od = con.sql(oracles[name]).df()
        ocols = list(od.columns)
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"  {name:28s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(sdf) != len(od):
            print(f"  {name:28s} COUNT MISMATCH spark={len(sdf)} duck={len(od)}")
            ok = False
        elif dtype_mismatches(sdf, od):
            print(f"  {name:28s} DTYPE MISMATCH {dtype_mismatches(sdf, od)}"
                  f"  (cast the oracle aggregate, e.g. ::BIGINT)")
            ok = False
        else:
            a = normalize(sdf.to_dict("records"), scols)
            b = normalize(od.to_dict("records"), ocols)
            if a != b:
                diff = [x for x in a if x not in set(b)][:3]
                diff2 = [x for x in b if x not in set(a)][:3]
                print(f"  {name:28s} VALUE MISMATCH e.g. spark-only={diff} duck-only={diff2}")
                ok = False
        if ok:
            print(f"  {name:28s} OK rows={len(sdf)}")
        else:
            failures.append(name)

    # entry() smoke
    edf = E.entry(spark)
    n = edf.count()
    print(f"  entry() rows={n} schema={edf.schema.simpleString()}")
    spark.stop()
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
