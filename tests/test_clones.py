"""X79 type-1 / type-2 clone keys: planted-fork semantics, keyword-structure
preservation, guard-forgery immunity, and the Spark ≡ DuckDB single-source
pattern rendering."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minhash_spark.operators import clones
from minhash_spark.plans import queries as Q

BASE = """/*
 * Example license header — stripped by type-1.
 */
public class Account {
    // running balance in cents
    private int balance = 100;
    public int add(int amount) {
        return balance + amount;  // no overflow check
    }
}
"""

# layout fork: same tokens, different whitespace + different comments
LAYOUT_FORK = (
    "/* different header */\n"
    "public class Account {\n"
    "  private int balance=100;\n"
    "  public int add(int amount) { return balance+amount; }\n"
    "}\n"
)

# rename fork: identifiers + numeric literal renamed, structure identical
RENAME_FORK = (
    "/* rebranded */\n"
    "public class Ledger {\n"
    "  private int total=250;\n"
    "  public int add(int delta) { return total+delta; }\n"
    "}\n"
)

UNRELATED = "def greet(name):\n    return 'hi ' + name\n"


def _t1(s: str) -> str:
    return _eval(clones.normalize_type1, s)


def _t2(s: str) -> str:
    return _eval(clones.normalize_type2, s)


_cache: dict = {}


def _eval(fn, s: str) -> str:
    """Evaluate a column builder on a literal via DuckDB-free local Spark —
    but without needing the session fixture for pure-expression tests we
    lean on the module-level session created lazily by the spark fixture
    in the query tests; here we use the SQL rendering through DuckDB since
    the equality of the two renderings is itself under test."""
    import duckdb

    chain = clones.TYPE1_CHAIN if fn is clones.normalize_type1 else clones.TYPE2_CHAIN
    expr = clones.duckdb_expr("t", chain)
    return duckdb.sql(f"SELECT {expr} AS v FROM (SELECT ? AS t)", params=[s]).fetchone()[0]


def test_layout_fork_shares_t1_rename_fork_does_not():
    assert _t1(BASE) == _t1(LAYOUT_FORK)
    assert _t1(BASE) != _t1(RENAME_FORK)
    # punctuation-adjacent spacing is layout; inter-token spacing is not
    assert _t1("a = 1 ;") == _t1("a=1;") == _t1("a  =  1\t;")
    assert _t1("a = 1 ;") != _t1("a = 2 ;")  # literals kept at type-1
    assert _t1("int x") != _t1("intx")  # word boundary preserved


def test_rename_fork_collapses_at_t2_only():
    assert _t2(BASE) == _t2(LAYOUT_FORK) == _t2(RENAME_FORK)
    assert _t1(BASE) != _t1(RENAME_FORK)
    assert _t2(BASE) != _t2(UNRELATED)


def test_type2_preserves_control_flow_keywords():
    assert _t2("if (x) return 1;") == _t2("if (y) return 2;")
    assert _t2("if (x) return 1;") != _t2("while (x) return 1;")
    assert _t2("for i in xs: f(i)") != _t2("if i in xs: f(i)")


def test_type2_abstracts_strings_numbers_identifiers():
    out = _t2('log("failed", retries, 3)')
    assert out == "ID(S,ID,N)"
    # string placeholder cannot be forged: a literal § sequence in the
    # input is scrubbed before any guard is planted
    assert _t2("§S§") == "ID"
    assert _t2('"x"') == "S"
    assert _t2("§if x") == _t2("if x")


def test_spark_matches_duckdb_rendering(spark):
    """The two renderings of the SAME chain must agree byte-for-byte on
    adversarial inputs (unterminated comments, escaped quotes, control
    whitespace, guard chars, CRLF)."""
    import duckdb

    import pandas as pd
    from pyspark.sql import functions as F

    samples = [
        BASE,
        LAYOUT_FORK,
        RENAME_FORK,
        UNRELATED,
        "/* unterminated",
        "'don''t' \"q\" plain // tail",
        "a\tb\x0b c\x0c d\r\ne",
        "§ forged § if x §S§",
        "x1 1x 0x1F 42 4.2 _x __",
        "",
    ]
    pdf = pd.DataFrame({"i": range(len(samples)), "t": samples})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            clones.normalize_type1(F.col("t")).alias("t1"),
            clones.normalize_type2(F.col("t")).alias("t2"),
        )
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("s", pdf)
    want = con.sql(
        f"SELECT i, {clones.duckdb_expr('t', clones.TYPE1_CHAIN)} AS t1, "
        f"{clones.duckdb_expr('t', clones.TYPE2_CHAIN)} AS t2 FROM s ORDER BY i"
    ).df()
    for i in range(len(samples)):
        assert got["t1"][i] == want["t1"][i], (i, got["t1"][i], want["t1"][i])
        assert got["t2"][i] == want["t2"][i], (i, got["t2"][i], want["t2"][i])


def test_clone_queries_on_planted_corpus(spark, tmp_path):
    """Planted 6-doc corpus: {BASE, LAYOUT_FORK, RENAME_FORK, exact copy of
    BASE, UNRELATED, unrelated2}. Expected: t1 collapses {0,1,3} (layout
    fork has identical tokens); t2 collapses {0,1,2,3}; clone_forks reports
    exactly one cluster with n_docs=4, n_layout_variants=2 (the shared
    BASE/layout key + the rename key), n_raw_variants=3 (BASE==copy)."""
    rows = [
        (0, BASE),
        (1, LAYOUT_FORK),
        (2, RENAME_FORK),
        (3, BASE),
        (4, UNRELATED),
        (5, "SELECT * FROM t -- unrelated2\n"),
    ]
    p = str(tmp_path / "clones")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    per_doc = {r["doc_id"]: r for r in Q.q_normalized_clones(spark, p).collect()}
    assert per_doc[0]["t1_sha"] == per_doc[3]["t1_sha"] == per_doc[1]["t1_sha"]
    assert per_doc[0]["t1_sha"] != per_doc[2]["t1_sha"]
    assert per_doc[0]["t1_size"] == 3 and per_doc[2]["t1_size"] == 1
    t2s = {per_doc[i]["t2_sha"] for i in (0, 1, 2, 3)}
    assert len(t2s) == 1
    assert per_doc[0]["t2_size"] == 4
    assert per_doc[4]["t2_sha"] != per_doc[0]["t2_sha"]

    forks = Q.q_clone_forks(spark, p).collect()
    assert len(forks) == 1
    f0 = forks[0]
    assert f0["cluster_sha"] == per_doc[0]["t2_sha"]
    assert f0["n_docs"] == 4
    assert f0["n_layout_variants"] == 2
    assert f0["n_raw_variants"] == 3  # BASE==copy byte-equal; layout, rename
    assert f0["rep_doc_id"] == 0


def test_fixture_rename_mutation_is_a_type2_clone(spark):
    """Corpus B's mutate kind 0 renames one identifier globally (fixtures.py:
    _mutate) — by construction that file is a type-2 clone of its base.
    Build one deterministically and pin the t2 equality / t1 inequality."""
    from minhash_spark.sources import fixtures as FX
    import random

    rng = random.Random(7)
    idents = [f"var_{i:02d}" for i in range(60)]
    base_lines = FX._base_file(rng, "java", idents)
    base = "\n".join(base_lines)
    old = next(i for i in idents if i in base)
    renamed = base.replace(old, "zz_renamed_9")
    assert _t2(base) == _t2(renamed)
    assert _t1(base) != _t1(renamed)
