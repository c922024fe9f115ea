"""Type-1 / type-2 source-code clone keys (X79).

The clone-detection ladder every large-scale code-dedup run climbs
(SourcererCC, The Stack's near-dedup ablations): exact bytes < type-1
(layout/comment-insensitive) < type-2 (identifier/literal-abstracted) <
type-3 (near-dup — the MinHash pipeline, P1-P8). This module supplies the
two missing middle rungs as pure NATIVE ``regexp_replace`` chains — a
per-row map fused into the scan by whole-stage codegen, zero UDF, zero
shuffle; the dedup itself is one partial-agg ``groupBy`` on a sha256 key.

Single-source-of-truth discipline: each normalization chain is declared
ONCE as a ``(pattern, replacement)`` list in the Java-regex ∩ RE2 subset
and rendered to BOTH engines (``spark_expr`` → pyspark Column,
``duckdb_expr`` → SQL string), so the DuckDB oracle runs byte-identical
patterns by construction. Two portability pins the subset demands:
``$1``/``\\1`` backreference syntax differs per engine (handled by the
``G1`` marker), and ``\\s`` differs (Java includes ``\\x0b``, RE2 does
not) so whitespace uses an explicit class.

Keyword preservation without lookarounds (RE2 has none): keywords are
prefixed with a guard char scrubbed from the input up front (forged
guards impossible), the identifier pass excludes guard-preceded tokens
via a captured preceding-char class, then guards are dropped.

Reference scope note: the reference plugin (MinHashFieldMapper.java)
hashes raw analyzed tokens and has no normalization stage; this ladder is
part of the training-data-pipeline extension mandated by the build brief
(north_rule: source-code payload).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Guard char: scrubbed from input by pass 0, so later passes can use it as
# an unforgeable marker. Any single non-word, non-whitespace char works;
# it never survives into the output.
GUARD = "§"  # §

# Multi-language keyword set (java/py/js/go — the fixture corpus languages —
# plus the shared C-family core). Kept: abstracting keywords would erase
# control-flow structure and merge `if` with `while`.
KEYWORDS = (
    "if|else|elif|for|while|return|def|class|import|from|function|"
    "var|let|const|public|private|static|void|int|final|new|try|catch|"
    "except|finally|switch|case|break|continue|package|func|type|struct|"
    "range|export|async|await|self|in|is"
)

# Explicit whitespace class — Java's \s includes \x0b, RE2's does not.
_WS = "[ \\t\\r\\n\\x0b\\x0c]+"
# Tighten spacing around punctuation AFTER whitespace collapse, so
# `balance = 100;` and `balance=100;` share a key: any single space
# adjacent to a non-word char is structural layout, not a token boundary.
# (Inside string literals this also tightens `a, b` to `a,b` — a clone KEY
# is a quotient, not a reconstruction; both engines quotient identically.)
_PUNCT_TIGHT = (" ?([^A-Za-z0-9_ ]) ?", "G1")
_BLOCK_COMMENT = "(?s)/\\*.*?\\*/"   # non-greedy DOTALL; both engines
_LINE_COMMENT_SLASH = "//[^\\n]*"
_LINE_COMMENT_HASH = "#[^\\n]*"

# Type-1: layout + comment insensitive, literals kept. (Classic caveat,
# shared with every regex-level type-1 tool: a `//` inside a string literal
# is treated as a comment; deterministic and identical in both engines.)
TYPE1_CHAIN: list[tuple[str, str]] = [
    (GUARD, " "),
    (_BLOCK_COMMENT, " "),
    (_LINE_COMMENT_SLASH, " "),
    (_LINE_COMMENT_HASH, " "),
    (_WS, " "),
    _PUNCT_TIGHT,
]

# Type-2: type-1 plus literal + identifier abstraction. Order matters:
# strings collapse first (guard-protected placeholder so the identifier
# pass skips it), comments next, keywords get guarded, identifiers become
# ID via the captured-preceding-char idiom (no lookbehind in RE2), numeric
# literals become N, guards drop, whitespace collapses.
TYPE2_CHAIN: list[tuple[str, str]] = [
    (GUARD, " "),
    ('"[^"\\n]*"', GUARD + "S" + GUARD),
    ("'[^'\\n]*'", GUARD + "S" + GUARD),
    (_BLOCK_COMMENT, " "),
    (_LINE_COMMENT_SLASH, " "),
    (_LINE_COMMENT_HASH, " "),
    ("\\b(" + KEYWORDS + ")\\b", GUARD + "G1"),
    ("(^|[^" + GUARD + "A-Za-z0-9_])([A-Za-z_][A-Za-z0-9_]*)", "G1ID"),
    ("\\b[0-9]+\\b", "N"),
    (GUARD, ""),
    (_WS, " "),
    _PUNCT_TIGHT,
]


def spark_expr(col: Column, chain: list[tuple[str, str]]) -> Column:
    """Render a chain as a native pyspark expression (trimmed)."""
    expr = col
    for pat, rep in chain:
        expr = F.regexp_replace(expr, pat, rep.replace("G1", "$1"))
    return F.trim(expr)


def duckdb_expr(col_sql: str, chain: list[tuple[str, str]]) -> str:
    """Render the SAME chain as DuckDB SQL (trimmed) for the oracle."""
    expr = col_sql
    for pat, rep in chain:
        p = pat.replace("'", "''")
        r = rep.replace("G1", "\\1").replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


def normalize_type1(col: Column) -> Column:
    return spark_expr(col, TYPE1_CHAIN)


def normalize_type2(col: Column) -> Column:
    return spark_expr(col, TYPE2_CHAIN)


def clone_keys(col: Column) -> dict[str, Column]:
    """Per-row clone keys: sha256 of each normalized form.

    The full 64-hex key keeps the driver oracle byte-exact; a 10^12-file
    run would shuffle ``unhex(...)`` (32 raw bytes) or xxhash64 of the
    normalized text instead — same plan shape, half the shuffle width.
    """
    return {
        "t1_sha": F.sha2(normalize_type1(col), 256),
        "t2_sha": F.sha2(normalize_type2(col), 256),
    }
