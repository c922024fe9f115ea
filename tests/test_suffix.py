"""Suffix-array machinery (operators/suffix.py): construction vs a
definitional sort, Kasai LCP vs direct prefix comparison, and the
longest-repeat operator vs an O(n^2) brute force — including overlapping
repeats, unicode, and degenerate inputs."""

from __future__ import annotations

import random

import numpy as np

from minhash_spark.operators.suffix import lcp_kasai, longest_repeat_len, suffix_array
from minhash_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def _ords(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def _brute_sa(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def _brute_longest_repeat(s: str) -> int:
    n = len(s)
    for L in range(n - 1, 0, -1):
        seen = set()
        for i in range(n - L + 1):
            sub = s[i : i + L]
            if sub in seen:
                return L
            seen.add(sub)
    return 0


def test_suffix_array_matches_definitional_sort():
    rng = random.Random(7)
    cases = ["banana", "aaaa", "abab", "", "z", "mississippi"]
    cases += ["".join(rng.choice("abc") for _ in range(rng.randint(2, 200))) for _ in range(30)]
    cases += ["".join(rng.choice("ab") for _ in range(50)) for _ in range(10)]
    for s in cases:
        got = suffix_array(_ords(s)).tolist()
        assert got == _brute_sa(s), s


def test_lcp_kasai_matches_direct_comparison():
    rng = random.Random(11)
    for _ in range(25):
        s = "".join(rng.choice("ab") for _ in range(rng.randint(2, 120)))
        o = _ords(s)
        sa = suffix_array(o)
        lcp = lcp_kasai(o, sa)
        assert lcp[0] == 0
        for r in range(1, len(s)):
            a, b = s[sa[r] :], s[sa[r - 1] :]
            direct = 0
            while direct < min(len(a), len(b)) and a[direct] == b[direct]:
                direct += 1
            assert lcp[r] == direct, (s, r)


def test_longest_repeat_brute_force_and_edges():
    rng = random.Random(13)
    # overlapping repeat: "aaaa" repeats "aaa" at offsets 0 and 1
    assert longest_repeat_len("aaaa") == 3
    assert longest_repeat_len("abcdef") == 0
    assert longest_repeat_len("") == 0
    assert longest_repeat_len("x") == 0
    assert longest_repeat_len("漢字漢字") == 2  # unicode, non-BMP-safe path
    for _ in range(40):
        s = "".join(rng.choice("abcd") for _ in range(rng.randint(2, 150)))
        assert longest_repeat_len(s) == _brute_longest_repeat(s), s


def test_repeated_substring_scores_query(spark, tmp_path):
    """The Spark operator: a doc that is one block pasted twice scores
    repeat_ratio ~0.5; exact-duplicate DOCS don't matter (per-doc signal);
    planted values match the kernel function exactly."""
    import pyspark.sql.functions as F

    block = "the quick brown fox jumps over the lazy dog " * 3
    data = [
        (0, block + block),                 # whole-block self repeat
        (1, "completely unique words only zebra yak xylophone"),
        (2, ""),
    ]
    p = str(tmp_path / "rep")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")
    out = {r["doc_id"]: r for r in Q.q_repeated_substring_scores(spark, p).collect()}
    for doc_id, text in data:
        assert out[doc_id]["max_repeat_len"] == longest_repeat_len(text), doc_id
        assert out[doc_id]["n_chars"] == len(text)
    # a text pasted twice repeats at least its full half (overlap can extend it)
    assert out[0]["max_repeat_len"] >= len(block)
    assert out[0]["repeat_ratio"] >= 0.5
    assert out[2]["max_repeat_len"] == 0 and out[2]["repeat_ratio"] == 0.0
    # runs over the driver corpus without shuffles or errors
    rows = Q.q_repeated_substring_scores(spark, SF).collect()
    assert len(rows) == 500
    assert all(0 <= r["max_repeat_len"] < r["n_chars"] for r in rows if r["n_chars"] > 0)
