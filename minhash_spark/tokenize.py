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
# The four alternation arms are named constants so _STANDARD_RE and the WB4
# variant are composed from the SAME pieces (ADVICE r3: re-splitting the
# compiled pattern string on '|' silently miscompiles if an arm ever gains
# an internal alternation).
_ARM_CJK = r"[一-鿿㐀-䶿豈-﫿〇]"
_ARM_KATAKANA = r"[゠-ヿㇰ-ㇿｦ-ﾟ]+"
_ARM_HIRAGANA = r"[぀-ゟ]+"
def _word_arm(extend: str = "") -> str:
    """The word-run arm; ``extend`` widens the run class with characters that
    are WB4-transparent inside a word (combining marks / format chars).
    The plain and WB4 variants MUST be built from this one function."""
    run = r"\w" + (rf"[\w{extend}]*" if extend else "+")
    return rf"{run}(?:(?:['’](?=[^\W\d_])|(?<=\d)[.,](?=\d)){run})*"


_ARM_WORD = _word_arm()

_STANDARD_RE = re.compile(
    "|".join([_ARM_CJK, _ARM_KATAKANA, _ARM_HIRAGANA, _ARM_WORD]),
    re.UNICODE,
)


# Lucene StandardTokenizer default (StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH);
# longer runs are split at this interval, matching the scanner's behavior.
STANDARD_MAX_TOKEN_LENGTH = 255

_WB4_RE = None


def _collapse_ranges(cps: list[int]) -> str:
    out = []
    i = 0
    while i < len(cps):
        j = i
        while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
            j += 1
        a, b = cps[i], cps[j]
        enc = lambda c: f"\\U{c:08x}" if c > 0xFFFF else f"\\u{c:04x}"  # noqa: E731
        out.append(enc(a) if a == b else f"{enc(a)}-{enc(b)}")
        i = j + 1
    return "".join(out)


def _wb4_standard_re():
    """UAX#29 WB4-aware variant of _STANDARD_RE: Extend (Mn/Mc/Me: combining
    marks) and Format (Cf: ZWJ/ZWNJ, soft hyphen, bidi controls, BOM)
    codepoints are TRANSPARENT inside a word run -- "cafe\u0301" or
    "ab<ZWJ>cd" stay single tokens (marks kept in the token text, as
    Lucene's standard tokenizer keeps them) instead of splitting at the
    mark. A token still cannot START with an Extend/Format char (a lone
    mark is not a word). Built lazily once per process: the class
    enumeration walks the full codepoint space (~0.3 s) and is cached."""
    global _WB4_RE
    if _WB4_RE is None:
        import sys as _sys
        import unicodedata as _ud

        cps = [
            cp
            for cp in range(_sys.maxunicode + 1)
            if _ud.category(chr(cp)) in ("Mn", "Mc", "Me", "Cf")
        ]
        ext = _collapse_ranges(cps)
        # same alternation as _STANDARD_RE, with the word-run arm widened \u2014
        # composed from the SAME named arm constants (never re-split from a
        # compiled pattern string)
        _WB4_RE = re.compile(
            "|".join([_ARM_CJK, _ARM_KATAKANA, _ARM_HIRAGANA, _word_arm(ext)]),
            re.UNICODE,
        )
    return _WB4_RE


def word_tokens(text: str) -> list[str]:
    """Word tokens; exact standard-tokenizer match on the fixture corpus."""
    return _WORD_RE.findall(text)


def standard_tokens(
    text: str, max_token_length: int = STANDARD_MAX_TOKEN_LENGTH
) -> list[str]:
    """Lucene-``standard``-approximating UAX#29 word segmentation. Exact on
    the reference fixture corpus and on the common cases real text hits:
    apostrophes, decimal/grouped numbers, CJK, combining marks / ZWJ inside
    words (UAX#29 WB4 transparency), and the Lucene default 255-char token
    cap (over-long runs split at the cap, like the StandardTokenizer
    scanner, MinHashTokenFilterFactory.java:47-49 default analyzer)."""
    toks = _wb4_standard_re().findall(text)
    # Lucene's maxTokenLength counts UTF-16 code units (Java chars), not
    # codepoints (ADVICE r3): a supplementary-plane character costs 2. For
    # BMP-only tokens len(t) == UTF-16 length, so the fast path is exact;
    # over-long runs containing astral chars split at UTF-16-unit budgets
    # (never inside a codepoint — Python strings can't hold half a
    # surrogate; the reference scanner likewise refills its buffer on
    # codepoint boundaries, zzRefill/CharacterUtils.fill).
    if any(len(t) > max_token_length // 2 for t in toks):
        out: list[str] = []
        for t in toks:
            u16 = sum(2 if ord(c) > 0xFFFF else 1 for c in t)
            if u16 <= max_token_length:
                out.append(t)
            else:
                piece, budget = [], max_token_length
                for c in t:
                    w = 2 if ord(c) > 0xFFFF else 1
                    if w > budget:
                        out.append("".join(piece))
                        piece, budget = [], max_token_length
                    piece.append(c)
                    budget -= w
                if piece:
                    out.append("".join(piece))
        return out
    return toks

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


def _make_asciifold():
    """Strip combining marks after NFKD decomposition (Lucene
    ``asciifolding``'s common case: café -> cafe); non-decomposable
    non-ASCII (CJK etc.) passes through unchanged."""
    import unicodedata

    def fold(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            if t.isascii():
                out.append(t)
            else:
                out.append(
                    "".join(
                        c
                        for c in unicodedata.normalize("NFKD", t)
                        if not unicodedata.combining(c)
                    )
                )
        return out

    return fold


def _make_length(min: int = 1, max: int = 255):
    return lambda tokens: [t for t in tokens if min <= len(t) <= max]


def _make_truncate(length: int = 10):
    return lambda tokens: [t[:length] for t in tokens]


# identifier sub-word parts, Lucene WordDelimiterGraphFilter default rules:
# acronym runs ([A-Z]+ not followed by lowercase), capitalized words,
# lowercase runs, digit runs (alpha<->digit transitions split); non-ASCII
# runs pass through whole. Underscores/punctuation never match -> split.
_DELIM_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+|[^\x00-\x7f]+")


def _make_word_delimiter(preserve_original: bool = False):
    """Split identifiers into sub-words (camelCase, PascalCase, snake_case,
    ACRONYMWord, alpha-digit) — the Lucene ``word_delimiter_graph`` analog
    and the standard tokenization for source-code dedup/search ("a fork that
    renamed getHttpResponse to get_http_response still shares sub-words").
    ``preserve_original`` additionally emits the unsplit token."""

    def split(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            parts = _DELIM_RE.findall(t)
            if preserve_original and parts != [t]:
                out.append(t)
            out.extend(parts if parts else [t])
        return out

    return split


TOKEN_FILTERS = {
    "lowercase": lambda **kw: _lowercase,
    "stop": lambda stopwords=None, **kw: (_make_stop(stopwords) if stopwords else _make_stop()),
    "asciifolding": lambda **kw: _make_asciifold(),
    "length": lambda min=1, max=255, **kw: _make_length(min, max),
    "truncate": lambda length=10, **kw: _make_truncate(length),
    "word_delimiter": lambda preserve_original=False, **kw: _make_word_delimiter(
        preserve_original
    ),
}


# char filters (pre-tokenization text transforms — the analyzer chain's
# first stage; the reference accepts any ES analyzer whose char_filter list
# includes these, MinHashFieldMapper.java:143-152)
_TAG_RE = re.compile(r"<[^>]*>")


def _make_html_strip():
    return lambda text: _TAG_RE.sub(" ", text)


def _make_mapping(mappings: dict[str, str] | list[str]):
    """ES ``mapping`` char filter: literal from=>to replacements, applied
    longest-from first (same greedy behavior as Lucene's NormalizeCharMap)."""
    if isinstance(mappings, dict):
        pairs = list(mappings.items())
    else:  # ES syntax list: ["from=>to", ...]
        bad = [m for m in mappings if "=>" not in m]
        if bad:
            raise ValueError(f"mapping entries must be 'from=>to': {bad!r}")
        pairs = [tuple(m.split("=>", 1)) for m in mappings]
    pairs = [p for p in pairs if p[0]]
    if not pairs:
        # an empty pattern would match at every position and KeyError on the
        # first document inside an executor; fail at chain build instead
        raise ValueError("mapping char filter requires at least one non-empty 'from'")
    pairs.sort(key=lambda p: -len(p[0]))
    pat = re.compile("|".join(re.escape(f) for f, _ in pairs))
    table = dict(pairs)

    def apply(text: str) -> str:
        return pat.sub(lambda m: table[m.group(0)], text)

    return apply


def _make_pattern_replace(pattern: str, replacement: str = ""):
    rx = re.compile(pattern)
    return lambda text: rx.sub(replacement, text)


CHAR_FILTERS = {
    "html_strip": lambda **kw: _make_html_strip(),
    "mapping": lambda mappings=(), **kw: _make_mapping(mappings),
    "pattern_replace": lambda pattern="", replacement="", **kw: _make_pattern_replace(
        pattern, replacement
    ),
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

    ``params['char_filters']``: ordered pre-tokenization text transforms
    (CHAR_FILTERS); ``params['filters']``: ordered token-filter chain
    (TOKEN_FILTERS). Each entry is a name or a (name, kwargs) pair — the
    Spark analogue of the reference's named analyzer resolution
    (char_filter + tokenizer + filter, MinHashFieldMapper.java:143-152).
    Both chains participate in config_hash via tokenizer_params, so changing
    a chain invalidates checkpoints."""

    def resolve(specs, registry):
        built = []
        for spec in specs or ():
            if isinstance(spec, str):
                fname, kw = spec, {}
            else:
                fname, kw = spec[0], dict(spec[1])
            built.append(registry[fname](**kw))
        return built

    params = dict(params)
    filter_specs = params.pop("filters", None)
    char_specs = params.pop("char_filters", None)
    fn = TOKENIZERS[name]
    if params:
        base = lambda text: fn(text, **params)  # noqa: E731
    else:
        base = fn
    if not filter_specs and not char_specs:
        return base
    cchain = resolve(char_specs, CHAR_FILTERS)
    tchain = resolve(filter_specs, TOKEN_FILTERS)

    def analyze(text: str) -> list[str]:
        for cf in cchain:
            text = cf(text)
        toks = base(text)
        for filt in tchain:
            toks = filt(toks)
        return toks

    return analyze
