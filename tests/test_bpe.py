"""X83: BPE trainer/encoder pinned against an independently-written naive
implementation (Sennrich-style regex-replace on space-joined symbol strings
— structurally different from the operator's tuple-scan), plus Spark-side
vocabulary-pass and encode-UDF equivalences."""

from __future__ import annotations

import re
from collections import Counter

from minhash_spark.operators import bpe

SF = "/root/testdata/sf0.001"


def naive_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Reference implementation: words as space-joined symbol strings,
    merges applied via whole-token regex replace (the published algorithm's
    form), pair choice (max count, lexicographically smallest)."""
    vocab = {" ".join(list(w)) + " " + bpe.END: n for w, n in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for ws, n in vocab.items():
            syms = ws.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pattern = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = {pattern.sub(best[0] + best[1], ws): n for ws, n in vocab.items()}
    return merges


TEXTBOOK = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

CODE_WORDS = {
    "def": 40, "define": 8, "defer": 5, "return": 30, "returns": 12,
    "import": 25, "importer": 3, "self": 50, "shelf": 4, "print": 20,
    "printing": 7, "println": 6, "for": 35, "fork": 5, "format": 9,
    "in": 60, "int": 22, "init": 14, "index": 11, "io": 8,
}


def test_train_matches_naive_reference():
    for corpus in (TEXTBOOK, CODE_WORDS):
        for k in (1, 5, 20):
            assert bpe.train(list(corpus.items()), k) == naive_bpe(corpus, k), (
                corpus,
                k,
            )


def test_train_exhausts_gracefully():
    # single 1-char word: only ('a','</w>') is mergeable, then nothing
    merges = bpe.train([("a", 3)], 10)
    assert merges == [("a", bpe.END)]


def test_train_order_independent():
    items = list(CODE_WORDS.items())
    assert bpe.train(items, 12) == bpe.train(list(reversed(items)), 12)


def test_encode_replays_training_merges():
    """Encoding a training word must reproduce exactly the symbol sequence
    the trainer's final vocab holds for it (greedy lowest-rank inference ==
    in-order merge replay on in-training words)."""
    merges = bpe.train(list(CODE_WORDS.items()), 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in CODE_WORDS:
        syms = tuple(w) + (bpe.END,)
        for m in merges:
            syms = bpe._merge_word(syms, m)
        assert bpe.encode_word(w, ranks) == list(syms), w
        # round-trip: concatenation restores the word + marker
        assert "".join(bpe.encode_word(w, ranks)) == w + bpe.END


def test_encode_unseen_word_falls_back_to_chars():
    merges = bpe.train(list(TEXTBOOK.items()), 5)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = bpe.encode_word("zzz", ranks)
    assert "".join(toks) == "zzz" + bpe.END


def test_spark_word_counts_match_python_recount(spark):
    from minhash_spark.plans.queries import load

    docs = load(spark, SF, "documents")
    got = {r["word"]: r["n"] for r in bpe.word_counts(docs).collect()}
    c: Counter = Counter()
    for r in docs.select("text").collect():
        c.update(re.findall(bpe.WORD_RE, r["text"]))
    assert got == dict(c)


def test_learn_bpe_and_distributed_encode_consistent(spark):
    """End to end on the driver corpus: learn merges (bounded TakeOrdered ->
    driver loop), then the Arrow encode UDF must agree with the driver
    encoder on every document, and compress vs character count."""
    from pyspark.sql import functions as F

    from minhash_spark.plans.queries import load

    docs = load(spark, SF, "documents")
    merges = bpe.learn_bpe(docs, n_merges=40)
    assert len(merges) == 40
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    rows = docs.select("doc_id", "text").collect()
    for r in rows[:50]:
        want = sum(
            len(bpe.encode_word(w, ranks)) for w in re.findall(bpe.WORD_RE, r["text"])
        )
        assert counts[r["doc_id"]] == want, r["doc_id"]
    # merges learned on the corpus must compress it: per doc, never more
    # tokens than the no-merge ceiling (chars + one END marker per word),
    # and strictly fewer in aggregate
    w = F.regexp_extract_all("text", F.lit(bpe.WORD_RE), F.lit(0))
    ceil = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id",
            (
                F.aggregate(
                    F.transform(w, lambda t: F.length(t)),
                    F.lit(0),
                    lambda a, x: a + x,
                )
                + F.size(w)
            ).alias("c"),
        ).collect()
    }
    assert all(counts[d] <= ceil[d] for d in counts)
    assert sum(counts.values()) < sum(ceil.values())
