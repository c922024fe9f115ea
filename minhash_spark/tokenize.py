"""Tokenizers & shinglers (Spark-free, NumPy/regex level).

The reference delegates tokenization to any Lucene analyzer chain
(README.md:42; tests use the ``standard`` tokenizer, MinHashPluginTest.java:80-82).
We provide:

  * ``word_tokens`` — regex word split; exact for the reference fixture corpus
    ("test N" -> ["test","N"]) and a close UAX#29 approximation for code/ASCII;
  * ``char_shingles`` — k-gram character shingles over whitespace-normalized
    content (the standard unit for source-code near-dup detection);
  * ``word_shingles`` — n-gram shingles over word tokens.

All return LISTS of strings fed to the kernel; they run inside Arrow batches,
never per-row Python in the Spark plan (the pandas UDF maps a whole batch).
"""

from __future__ import annotations

import re
from collections.abc import Callable

_WORD_RE = re.compile(r"[0-9A-Za-z_]+")
_WS_RE = re.compile(r"\s+")


def word_tokens(text: str) -> list[str]:
    """Word tokens; exact standard-tokenizer match on the fixture corpus."""
    return _WORD_RE.findall(text)


def char_shingles(text: str, k: int = 9) -> list[str]:
    """k-char shingles over whitespace-normalized text (unique-ified by the
    kernel's per-doc dedup; order irrelevant to MinHash). Short texts (<k)
    yield the whole normalized text as one shingle."""
    norm = _WS_RE.sub(" ", text.strip())
    if len(norm) <= k:
        return [norm] if norm else []
    return [norm[i : i + k] for i in range(len(norm) - k + 1)]


def word_shingles(text: str, n: int = 3) -> list[str]:
    """n-gram word shingles joined by a single space."""
    toks = word_tokens(text)
    if len(toks) <= n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


TOKENIZERS: dict[str, Callable[..., list[str]]] = {
    "word": word_tokens,
    "char_shingle": char_shingles,
    "word_shingle": word_shingles,
}


def make_tokenizer(name: str, **params) -> Callable[[str], list[str]]:
    fn = TOKENIZERS[name]
    if params:
        return lambda text: fn(text, **params)
    return fn
