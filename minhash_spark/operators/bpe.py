"""BPE tokenizer training + encoding over a document corpus (X83).

The scale shape of classic byte-pair-encoding training (Sennrich et al.
2016) on a 100 TB corpus is NOT "iterate over the corpus per merge" — it is:

1. ONE corpus-wide pass: word -> count (a partial-agg groupBy; word
   frequencies follow Zipf, so the map-side combiner collapses most of the
   volume before the shuffle — the same `vocab`/`zipf_fit` exchange).
2. The merge loop runs on the VOCABULARY (weighted by count), which is
   bounded (~10^6-10^7 distinct words even at web scale) — small enough for
   a driver-side loop, exactly the bounded-driver-state pattern the IVF
   trainer uses (plans/queries.py:q_embedding_ann_ivf). A hard cap
   (`max_vocab` top words by count, deterministic count-desc/word-asc
   order) makes the bound explicit rather than hoped-for; the dropped tail
   is the low-mass Zipf tail by construction.
3. Encoding documents with the learned merges is a pure per-row map: an
   Arrow-batched pandas UDF with a per-batch word->tokens memo (words
   repeat heavily, so the memo hit rate is the corpus's type/token ratio).

Symbol convention: a word's initial symbols are its characters with a
trailing ``</w>`` end-of-word marker (the Sennrich convention), so merges
distinguish word-final from word-internal contexts. Pair selection is
deterministic: highest total count, ties to the lexicographically smallest
pair — the same total order on both the trainer and the test oracle.

X82 (`bpe_pair_stats`) is the single-iteration, word-granularity unit step
of this operator, with a DuckDB oracle; this module is the full trainer,
pinned by pytest against an independently-written naive implementation.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_spark.tokenize import _WORD_RE  # the dedup tokenizer's word domain

WORD_RE = _WORD_RE.pattern  # one source of truth: training describes the
# same token stream the word-mode signatures hash (X82 reuses this literal)
END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table — the ONLY corpus-wide pass BPE training
    needs. One partial-agg groupBy; Zipf repetition makes the combiner do
    the heavy reduction (same exchange the `vocab` query pays)."""
    toks = F.regexp_extract_all(text_col, F.lit(WORD_RE), F.lit(0))
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pair_stats(vocab: list[tuple[tuple[str, ...], int]]) -> Counter:
    stats: Counter = Counter()
    for syms, n in vocab:
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += n
    return stats


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train(word_count_rows: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side BPE merge loop over the (bounded) weighted vocabulary.

    Returns the learned merge list in rank order. Deterministic: pair choice
    is (max count, then lexicographically smallest pair); input order is
    irrelevant because counts are aggregated first."""
    vocab: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (END,), int(n)) for w, n in word_count_rows if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = [(_merge_word(s, best), n) for s, n in vocab]
    return merges


# the same bounded-driver-sample pattern as the IVF trainer: TakeOrdered of
# the top-mass vocabulary, never an unbounded collect
TRAIN_MAX_VOCAB = 65536


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab: int = TRAIN_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """One corpus pass (word_counts) -> capped TakeOrdered (count desc, word
    asc — deterministic under ties) -> driver merge loop."""
    wc = word_counts(docs, text_col)
    top = wc.orderBy(F.col("n").desc(), F.col("word")).limit(max_vocab).collect()
    return train([(r["word"], r["n"]) for r in top], n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly apply the lowest-rank applicable merge
    (the standard inference rule — identical to replaying training merges
    in order for words seen in training)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        rank = min(c[0] for c in cand)
        pair = None
        for r, i in cand:
            if r == rank:
                pair = (syms[i], syms[i + 1])
                break
        syms = list(_merge_word(tuple(syms), pair))
    return syms


def encode_tokens_udf(merges: list[tuple[str, str]]):
    """Arrow-batched text -> array<string> BPE-token encoder with a
    per-batch word memo (hit rate == the batch's type/token ratio). The
    merge list (KBs) broadcasts in the UDF closure — never a corpus-sized
    side table."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        from minhash_spark.tokenize import word_tokens

        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in word_tokens(t or ""):
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w, ranks)
                    memo[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _encode


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-doc learned-subword token counts — the post-training sibling of
    token_counts' fixed-regex n_bpe_tokens. Pure map, zero shuffle."""
    enc = encode_tokens_udf(merges)
    return docs.select(
        "doc_id",
        F.size(enc(F.col(text_col))).cast("long").alias("n_bpe_tokens"),
    )
