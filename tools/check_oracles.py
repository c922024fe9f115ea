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


# ---------------------------------------------------------------------------
# Machine-checked invariants for the rows-only queries() entries (VERDICT r5
# item 6): no full DuckDB oracle exists for these by design (murmur / zlib /
# sketch / winnowing bytes are not SQL-expressible), but each output obeys
# properties that ARE checkable against DuckDB's view of the same parquet —
# so a silent wrong answer after an aggressive-optimization round fails HERE,
# not only in a pytest pin on a fixture. Each checker returns a list of
# violation strings (empty = pass) given (sdf: pandas output, con: duckdb).

# the same word-shingle (n=3) token CTE the near_dup_pairs oracle uses — the
# simhash verify stage shares DOC_CFG, so its emitted jaccard column must
# reproduce under this exact token definition
_TOKS_CTE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS toks
  FROM t
)
"""


def _n_docs(con) -> int:
    return con.sql("SELECT count(*) FROM documents").fetchone()[0]


def _b64_len(s) -> int:
    import base64

    return len(base64.b64decode(s))


def _inv_simhash(sdf, con):
    bad = []
    if not (sdf["a_id"] < sdf["b_id"]).all():
        bad.append("pair ordering violated (a_id >= b_id)")
    if sdf.duplicated(["a_id", "b_id"]).any():
        bad.append("duplicate pairs emitted")
    if not sdf["hamming"].between(0, 3).all():
        bad.append("hamming outside the <=3 band-recall guarantee")
    if not (sdf["jaccard"] >= 0.8).all():
        bad.append("pair below the 0.8 verify threshold emitted")
    if len(sdf):
        con.register("simhash_pairs", sdf[["a_id", "b_id", "jaccard"]])
        mism = con.sql(
            _TOKS_CTE
            + """
            SELECT count(*) FROM simhash_pairs p
            JOIN d a ON a.doc_id = p.a_id JOIN d b ON b.doc_id = p.b_id
            WHERE abs(p.jaccard -
                  len(list_intersect(a.toks, b.toks))::DOUBLE
                  / len(list_distinct(list_concat(a.toks, b.toks)))) > 1e-9
            """
        ).fetchone()[0]
        con.unregister("simhash_pairs")
        if mism:
            bad.append(f"{mism} pairs whose jaccard does not reproduce in SQL")
    return bad


def _inv_bitstrings(sdf, con):
    # the reference's BitSet truncation quirk (MinHashFieldMapper packs via
    # java.util.BitSet.toByteArray(), which drops trailing ZERO bytes) is
    # replicated byte-exactly, so n_bits is a multiple of 8 AT MOST
    # size*bit — docs whose last packed bytes are zero legitimately emit
    # shorter strings (observed 3/500 at 120 bits on sf0.01)
    bad = []
    if len(sdf) != _n_docs(con):
        bad.append("row count != documents count")
    s = sdf.dropna(subset=["sig_bits"])  # null-content docs emit null rows
    if len(s) and not (
        (s["n_bits"] > 0) & (s["n_bits"] <= 128) & (s["n_bits"] % 8 == 0)
    ).all():
        bad.append("n_bits outside (0,128] or not byte-aligned")
    if len(s) and int(s["n_bits"].max()) != 128:
        bad.append("no doc packs to the full 128 bits (size*bit)")
    if len(s) and not (s["sig_bits"].str.len() == s["n_bits"]).all():
        bad.append("sig_bits length != n_bits")
    if len(s) and not s["sig_bits"].str.fullmatch("[01]+").all():
        bad.append("sig_bits charset not {0,1}")
    return bad


def _inv_doc_fingerprints(sdf, con):
    bad = []
    if len(sdf) != _n_docs(con):
        bad.append("row count != documents count")
    pos = sdf[sdf["n_shingles"] > 0]
    if not (pos["n_fingerprints"] >= 1).all():
        bad.append("doc with shingles but zero fingerprints")
    # winnowing picks the min of each sliding window: at most one NEW
    # fingerprint per window position, never more than the shingle count
    w = 8  # FP_WINDOW
    cap = pos["n_shingles"].where(
        pos["n_shingles"] <= w, (pos["n_shingles"] - w + 1)
    )
    if not (pos["n_fingerprints"] <= cap).all():
        bad.append("n_fingerprints exceeds the window-count bound")
    return bad


def _sig_checks(sdf, con, col, nbytes):
    bad = []
    if len(sdf) != _n_docs(con):
        bad.append("row count != documents count")
    # <= nbytes, not ==: the reference's BitSet.toByteArray() truncation
    # quirk (trailing zero bytes dropped) is replicated byte-exactly.
    # Null signatures are legal (null-content docs yield a null struct
    # fieldset per the minhash_struct_udf contract) — skip them here; the
    # identical-text check below still covers their grouping.
    lens = sdf[col].dropna().map(_b64_len)
    if len(lens) and not ((lens > 0) & (lens <= nbytes)).all():
        bad.append(f"{col} decodes outside (0,{nbytes}] bytes")
    if len(lens) and int(lens.max()) != nbytes:
        bad.append(f"no {col} decodes to the full {nbytes} bytes")
    # identical text => identical signature (pure function of content)
    texts = con.sql("SELECT doc_id, md5(text) AS h FROM documents").df()
    merged = sdf.merge(texts, on="doc_id")
    if (merged.groupby("h")[col].nunique() > 1).any():
        bad.append(f"identical texts with different {col}")
    return bad


def _inv_signatures(sdf, con):
    return _sig_checks(sdf, con, "sig_b64", 16)


def _inv_multi_signatures(sdf, con):
    bad = []
    for col, nbytes in (("sig_default", 16), ("sig_seeded", 16), ("sig_compact", 8)):
        bad += [f"{col}: {m}" for m in _sig_checks(sdf, con, col, nbytes)]
    return bad


def _inv_collapse(sdf, con):
    bad = []
    if int(sdf["n_docs"].sum()) != _n_docs(con):
        bad.append("sum(n_docs) != documents count")
    # dropna=False: a null-signature group (null-content docs) is one
    # legitimate group — default nunique() excluding NaN would flag a
    # spurious duplicate
    if sdf["sig_b64"].nunique(dropna=False) != len(sdf):
        bad.append("duplicate sig_b64 groups")
    if not (sdf["n_docs"] >= 1).all():
        bad.append("empty collapse group")
    return bad


def _inv_compression(sdf, con):
    bad = []
    if len(sdf) != _n_docs(con):
        bad.append("row count != documents count")
    exact = con.sql(
        "SELECT doc_id, octet_length(encode(text)) AS b FROM documents"
    ).df()
    merged = sdf.merge(exact, on="doc_id")
    if not (merged["n_bytes"] == merged["b"]).all():
        bad.append("n_bytes != utf-8 byte length of text")
    pos = merged[merged["n_bytes"] > 0]
    if (abs(pos["compression_ratio"] - pos["n_compressed"] / pos["n_bytes"]) > 5e-5).any():
        bad.append("compression_ratio != n_compressed/n_bytes at 4dp")
    return bad


def _inv_fp_matches(sdf, con):
    bad = []
    if len(sdf) and not (sdf["a_id"] < sdf["b_id"]).all():
        bad.append("pair ordering violated")
    if sdf.duplicated(["a_id", "b_id"]).any():
        bad.append("duplicate pairs")
    if len(sdf) and not (sdf["n_shared_fp"] >= 1).all():
        bad.append("pair with zero shared fingerprints")
    return bad


def _topk_checks(sdf, score_col, lo, hi):
    bad = []
    if not sdf[score_col].between(lo, hi).all():
        bad.append(f"{score_col} outside [{lo},{hi}]")
    for qid, g in sdf.groupby(sdf.columns[0]):
        g = g.sort_values("rank")
        if list(g["rank"]) != list(range(1, len(g) + 1)):
            bad.append(f"query {qid}: ranks not contiguous from 1")
            break
        if (g[score_col].diff().dropna() > 1e-9).any():
            bad.append(f"query {qid}: {score_col} increases with rank")
            break
    return bad


def _inv_ann_ivf(sdf, con):
    bad = _topk_checks(sdf, "cos_sim", -1.0, 1.0)
    if (sdf["query_id"] == sdf["neighbor_id"]).any():
        bad.append("self-match emitted")
    return bad


def _inv_sig_similar(sdf, con):
    return _topk_checks(sdf, "bit_match", 0.0, 1.0)


def _inv_ann_curve(sdf, con):
    bad = []
    s = sdf.sort_values("nprobe")
    if (s["recall_at_5"].diff().dropna() < -1e-12).any():
        bad.append("recall not monotone in nprobe")
    if s["recall_at_5"].iloc[-1] != 1.0:
        bad.append("full-probe recall != 1.0")
    if not s["scan_frac"].between(0, 1.0 + 1e-9).all():
        bad.append("scan_frac outside (0,1]")
    return bad


def _inv_repeat(sdf, con):
    bad = []
    if len(sdf) != _n_docs(con):
        bad.append("row count != documents count")
    exact = con.sql("SELECT doc_id, length(text) AS c FROM documents").df()
    merged = sdf.merge(exact, on="doc_id")
    if not (merged["n_chars"] == merged["c"]).all():
        bad.append("n_chars != length(text)")
    if not merged["repeat_ratio"].between(0, 1).all():
        bad.append("repeat_ratio outside [0,1]")
    if not (merged["max_repeat_len"] <= merged["n_chars"]).all():
        bad.append("max_repeat_len > n_chars")
    return bad


def _inv_profile(sdf, con):
    bad = []
    exact = con.sql(
        "SELECT source, count(*) AS n, count(DISTINCT text) AS u FROM documents GROUP BY source"
    ).df()
    merged = sdf.merge(exact, on="source")
    if len(merged) != len(exact):
        bad.append("source rows missing vs exact GROUP BY")
    if not (merged["n_docs"] == merged["n"]).all():
        bad.append("n_docs != exact per-source count")
    rel = abs(merged["approx_unique_texts"] - merged["u"]) / merged["u"].clip(lower=1)
    if not (rel <= 0.1).all():
        bad.append("approx_unique_texts >10% off the exact distinct count")
    if not (
        (sdf["p50_tokens"] <= sdf["p90_tokens"]) & (sdf["p90_tokens"] <= sdf["p99_tokens"])
    ).all():
        bad.append("token percentiles not monotone")
    return bad


INVARIANTS = {
    "approx_corpus_profile": _inv_profile,
    "simhash_near_dup_pairs": _inv_simhash,
    "minhash_bitstrings": _inv_bitstrings,
    "doc_fingerprints": _inv_doc_fingerprints,
    "minhash_signatures": _inv_signatures,
    "minhash_signatures_oph": _inv_signatures,
    "multi_signatures": _inv_multi_signatures,
    "minhash_collapse": _inv_collapse,
    "compression_scores": _inv_compression,
    "fingerprint_matches": _inv_fp_matches,
    "embedding_ann_ivf": _inv_ann_ivf,
    "signature_similar_docs": _inv_sig_similar,
    "ann_operating_curve": _inv_ann_curve,
    "repeated_substring_scores": _inv_repeat,
}


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
            inv = INVARIANTS.get(name)
            viol = inv(sdf, con) if inv else []
            tag = "rows-only+invariants" if inv else "rows-only"
            print(f"  {name:28s} rows={len(sdf)} cols={scols}  ({tag})")
            if len(sdf) == 0 and name not in ("exact_dup_pairs",):
                print(f"    WARNING: empty result")
            for v in viol:
                print(f"    INVARIANT VIOLATED: {v}")
            if viol:
                failures.append(name)
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
