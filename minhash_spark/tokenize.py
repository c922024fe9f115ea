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

# UAX#29-style word segmentation approximating Lucene's ``standard``
# tokenizer (MinHashTokenFilterFactory.java:47-49 accepts any analyzer; the
# reference tests use ``standard``). Rules covered, in alternation order:
#   * Han ideographs emit as UNIGRAMS (Lucene standard's ideographic rule);
#   * Katakana runs as one token; Hiragana runs as one token;
#   * word runs (\w covers Unicode letters/digits/underscore = ALetter,
#     Numeric, ExtendNumLet) joined across UAX#29 mid-word characters:
#     apostrophe between letters (don't), period/comma between digits
#     (3.14, 1,000).
_STANDARD_RE = re.compile(
    r"[一-鿿㐀-䶿豈-﫿〇]"
    r"|[゠-ヿㇰ-ㇿｦ-ﾟ]+"
    r"|[぀-ゟ]+"
    r"|\w+(?:(?:['’](?=[^\W\d_])|(?<=\d)[.,](?=\d))\w+)*",
    re.UNICODE,
)


def word_tokens(text: str) -> list[str]:
    """Word tokens; exact standard-tokenizer match on the fixture corpus."""
    return _WORD_RE.findall(text)


def standard_tokens(text: str) -> list[str]:
    """Lucene-``standard``-approximating UAX#29 word segmentation (see
    _STANDARD_RE). Exact on the reference fixture corpus and on the common
    cases real text hits: apostrophes, decimal/grouped numbers, CJK."""
    return _STANDARD_RE.findall(text)


# analyzer-chain token filters (the reference resolves full named analyzer
# chains — tokenizer + filters — via MinHashFieldMapper.java:143-152; these
# are the chain stages the plugin's docs exercise)
def _lowercase(tokens: list[str]) -> list[str]:
    return [t.lower() for t in tokens]


def _make_stop(stopwords=("a", "an", "and", "are", "as", "at", "be", "but",
                          "by", "for", "if", "in", "into", "is", "it", "no",
                          "not", "of", "on", "or", "such", "that", "the",
                          "their", "then", "there", "these", "they", "this",
                          "to", "was", "will", "with")):
    stop = frozenset(stopwords)
    return lambda tokens: [t for t in tokens if t not in stop]


TOKEN_FILTERS = {
    "lowercase": lambda **kw: _lowercase,
    "stop": lambda stopwords=None, **kw: (_make_stop(stopwords) if stopwords else _make_stop()),
}


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
    "standard": standard_tokens,
    "char_shingle": char_shingles,
    "word_shingle": word_shingles,
}


def make_tokenizer(name: str, **params) -> Callable[[str], list[str]]:
    """Build a tokenizer, optionally wrapped in an analyzer chain.

    ``params['filters']``: ordered token-filter chain, each either a name in
    TOKEN_FILTERS or a (name, kwargs) pair — the Spark analogue of the
    reference's named analyzer resolution (tokenizer + filters,
    MinHashFieldMapper.java:143-152). Filters participate in config_hash via
    tokenizer_params, so changing a chain invalidates checkpoints."""
    params = dict(params)
    filter_specs = params.pop("filters", None)
    fn = TOKENIZERS[name]
    if params:
        base = lambda text: fn(text, **params)  # noqa: E731
    else:
        base = fn
    if not filter_specs:
        return base
    chain = []
    for spec in filter_specs:
        if isinstance(spec, str):
            fname, kw = spec, {}
        else:
            fname, kw = spec[0], dict(spec[1])
        chain.append(TOKEN_FILTERS[fname](**kw))

    def analyze(text: str) -> list[str]:
        toks = base(text)
        for filt in chain:
            toks = filt(toks)
        return toks

    return analyze
