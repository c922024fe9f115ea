"""Kernel unit tests: golden vectors (MinHashPluginTest.java:163-170),
oracle equivalence, packing quirks, property tests. No Spark involved."""

from __future__ import annotations

import random

import numpy as np
import pytest

from minhash_spark import kernel
from minhash_spark.tokenize import char_shingles, word_shingles, word_tokens

# (tokens, seed, size, bit, expected_base64) — the six golden vectors,
# MinHashPluginTest.java:163-170; configs :79-89.
GOLDEN = [
    (["test", "1"], 0, 128, 1, "Uji99jenq7da3aNKTYc8yQ=="),
    (["test", "1"], 1000, 128, 1, "fUkN7K0iiMHp1MxiGXnIaw=="),
    (["test", "1"], 1000, 32, 2, "W51pEPuK8tw="),
    (["test", "2"], 0, 128, 1, "AGB9/Yen+yf/lBvJKtMdQA=="),
    (["test", "2"], 1000, 128, 1, "8ShNb6UVCgPh16yxOd2Lew=="),
    (["test", "2"], 1000, 32, 2, "i11gJHsY/zw="),
]


@pytest.mark.parametrize("tokens,seed,size,bit,expected", GOLDEN)
def test_golden_vectors_vectorized(tokens, seed, size, bit, expected):
    mins = kernel.minhash_mins([tokens], seed=seed, size=size)
    packed = kernel.pack_bbit(mins, bit=bit)
    assert kernel.to_base64(packed[0].tobytes()) == expected


@pytest.mark.parametrize("tokens,seed,size,bit,expected", GOLDEN)
def test_golden_vectors_oracle(tokens, seed, size, bit, expected):
    sig = kernel.minhash_signature_oracle(tokens, seed, size, bit)
    assert kernel.to_base64(sig) == expected


def test_fixture_tokenizer_exact():
    # standard tokenizer on the fixture corpus (MinHashPluginTest.java:153-157)
    assert word_tokens("test 1") == ["test", "1"]
    assert word_tokens("test 99") == ["test", "99"]


def test_bit_string_encoding():
    # bit_string:true renders MSB-first per byte (MinHashFieldMapper.java:273-274)
    sig = bytes([0b00000001, 0b10000000])
    assert kernel.to_bit_string(sig) == "0000000110000000"


def test_trailing_zero_truncation():
    assert kernel.strip_trailing_zeros(b"\x01\x00\x02\x00\x00") == b"\x01\x00\x02"
    assert kernel.strip_trailing_zeros(b"\x00\x00") == b""


def test_empty_doc_is_long_max():
    mins = kernel.minhash_mins([[]], seed=0, size=8)
    assert (mins == kernel.LONG_MAX).all()


def test_order_and_multiplicity_invariance():
    a = kernel.minhash_mins([["x", "y", "z"]], seed=7, size=32)
    b = kernel.minhash_mins([["z", "y", "x", "x", "y"]], seed=7, size=32)
    assert (a == b).all()


def test_vectorized_equals_oracle_random():
    rng = random.Random(42)
    alphabet = ["foo", "bar", "x", "Ünïcode", "日本語", "emoji_\U0001F600", "", "a" * 40, "tail7chars"]
    docs = []
    for _ in range(25):
        docs.append([rng.choice(alphabet) for _ in range(rng.randint(1, 8))])
    docs.append([])
    for seed, size, bit in [(0, 16, 1), (1000, 8, 2), (123456, 5, 3), (-7, 4, 1)]:
        mins = kernel.minhash_mins(docs, seed=seed, size=size)
        packed = kernel.pack_bbit(mins, bit=bit)
        for i, toks in enumerate(docs):
            expect = kernel.minhash_signature_oracle(toks, seed, size, bit)
            assert packed[i].tobytes() == expect, (toks, seed, size, bit)


def test_hash_tokens_matches_oracle_per_seed():
    seeds = kernel._seed_longs(999, 5)
    toks = ["alpha", "béta", "0123456789abcdef", "x" * 17]
    h = kernel.hash_tokens(toks, seeds)
    for i, t in enumerate(toks):
        for j in range(5):
            assert h[i, j] == kernel.murmur3_x64_128_h1(t.encode("utf-16-le"), 999 + j)


def test_compare_identity_and_estimator():
    mins = kernel.minhash_mins([["a", "b", "c"], ["a", "b", "c"]], seed=0, size=128)
    p = kernel.pack_bbit(mins, bit=1)
    assert kernel.compare(p[0].tobytes(), p[1].tobytes()) == 1.0
    # b-bit estimator: disjoint sets, bit=1 -> E[bit match] ~ 0.5
    mins2 = kernel.minhash_mins([[f"a{i}" for i in range(200)], [f"b{i}" for i in range(200)]], seed=0, size=2048)
    p2 = kernel.pack_bbit(mins2, bit=1)
    m = kernel.compare(p2[0].tobytes(), p2[1].tobytes())
    assert 0.42 <= m <= 0.58
    assert kernel.estimate_jaccard(m, 1) < 0.17


def test_estimator_tracks_true_jaccard():
    # J = 1/3 overlap (shared 100 of 300-total union)
    a = [f"s{i}" for i in range(100)] + [f"a{i}" for i in range(100)]
    b = [f"s{i}" for i in range(100)] + [f"b{i}" for i in range(100)]
    mins = kernel.minhash_mins([a, b], seed=0, size=4096)
    p = kernel.pack_bbit(mins, bit=1)
    est = kernel.estimate_jaccard(kernel.compare(p[0].tobytes(), p[1].tobytes()), 1)
    assert abs(est - 1 / 3) < 0.06


def test_band_keys_shape_and_identity():
    mins = kernel.minhash_mins([["q", "w"], ["q", "w"], ["zz"]], seed=0, size=128)
    bk = kernel.band_keys(mins, num_bands=32, rows_per_band=4)
    assert bk.shape == (3, 32)
    assert (bk[0] == bk[1]).all()
    assert (bk[0] != bk[2]).any()
    # band index folded in: a doc's bands differ from each other (w.h.p.)
    assert len(set(bk[0].tolist())) == 32


def test_band_keys_bounds():
    mins = kernel.minhash_mins([["q"]], seed=0, size=8)
    with pytest.raises(ValueError):
        kernel.band_keys(mins, num_bands=4, rows_per_band=3)


def test_simhash_properties():
    s = kernel.simhash64([["a", "b", "c"], ["a", "b", "c"], ["zzz", "qqq"]])
    assert s[0] == s[1]
    assert s[0] != s[2]


def test_shinglers():
    assert char_shingles("ab  cd", k=3) == ["ab ", "b c", " cd"]
    assert char_shingles("ab", k=3) == ["ab"]
    assert char_shingles("   ", k=3) == []
    assert word_shingles("a b c d", n=2) == ["a b", "b c", "c d"]
    assert word_shingles("a b", n=3) == ["a b"]


def test_standard_tokenizer_uax29_cases():
    from minhash_spark.tokenize import make_tokenizer, standard_tokens

    # UAX#29 / Lucene-standard documented behaviors
    assert standard_tokens("don't stop") == ["don't", "stop"]
    assert standard_tokens("it’s fine") == ["it’s", "fine"]
    assert standard_tokens("pi is 3.14, count 1,000") == ["pi", "is", "3.14", "count", "1,000"]
    assert standard_tokens("foo_bar baz-qux") == ["foo_bar", "baz", "qux"]
    assert standard_tokens("'quoted'") == ["quoted"]
    assert standard_tokens("end.Start") == ["end", "Start"]
    # Han ideographs: unigrams; Katakana: one run; mixed script splits
    assert standard_tokens("日本語") == ["日", "本", "語"]
    assert standard_tokens("カタカナ language") == ["カタカナ", "language"]
    assert standard_tokens("ひらがな") == ["ひらがな"]
    # reference fixture corpus ("test N") unchanged vs the word tokenizer
    assert standard_tokens("test 1") == ["test", "1"]
    # analyzer chain: tokenizer + filters resolve like a named Lucene analyzer
    an = make_tokenizer("standard", filters=["lowercase", "stop"])
    assert an("The Quick BROWN fox And dog") == ["quick", "brown", "fox", "dog"]
    an2 = make_tokenizer("standard", filters=[("stop", {"stopwords": ["fox"]})])
    assert an2("the fox runs") == ["the", "runs"]


def test_analyzer_chain_char_and_token_filters():
    from minhash_spark.config import MinHashConfig
    from minhash_spark.tokenize import make_tokenizer

    # char filters run before tokenization, in declaration order
    an = make_tokenizer(
        "standard",
        char_filters=["html_strip"],
        filters=["lowercase"],
    )
    assert an("<p>Hello <b>World</b></p>") == ["hello", "world"]
    an = make_tokenizer(
        "standard",
        char_filters=[("mapping", {"mappings": ["C++=>cpp", "&=>and"]})],
    )
    assert an("C++ & Java") == ["cpp", "and", "Java"]
    an = make_tokenizer(
        "standard",
        char_filters=[("pattern_replace", {"pattern": r"//[^\n]*", "replacement": " "})],
    )
    assert an("code(); // strip this comment\nmore()") == ["code", "more"]
    # token filters: asciifolding, length, truncate
    an = make_tokenizer("standard", filters=["asciifolding", "lowercase"])
    assert an("Café naïve 東京") == ["cafe", "naive", "東", "京"]
    an = make_tokenizer("standard", filters=[("length", {"min": 3})])
    assert an("a bb ccc dddd") == ["ccc", "dddd"]
    an = make_tokenizer("standard", filters=[("truncate", {"length": 4})])
    assert an("abcdefgh xy") == ["abcd", "xy"]
    # chains validate at config build and participate in config_hash
    cfg = MinHashConfig(
        tokenizer="standard",
        tokenizer_params={"char_filters": ["html_strip"], "filters": ["lowercase"]},
    )
    cfg.validate()
    base = MinHashConfig(tokenizer="standard")
    assert cfg.config_hash() != base.config_hash()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown char filter"):
        MinHashConfig(
            tokenizer="standard", tokenizer_params={"char_filters": ["nope"]}
        ).validate()


def test_char_shingle_fast_path_equals_string_path():
    texts = [
        "def foo():  return 1\n\nclass Bar: pass",
        "def foo():  return 2\n\nclass Bar: pass",
        "short",
        "",
        "   ",
        "exactly16chars!!",
        "日本語テキストのサンプルですよ、こんにちは世界",
    ]
    fast = kernel.minhash_mins_char_shingle(texts, k=9, seed=1000, size=64)
    slow = kernel.minhash_mins([char_shingles(t, 9) for t in texts], seed=1000, size=64)
    assert (fast == slow).all()


def test_char_shingle_fast_path_duplicate_texts_equal_sig():
    texts = ["a b c d e f g h i j" * 5] * 3 + ["something else entirely different"]
    fast = kernel.minhash_mins_char_shingle(texts, k=9, seed=0, size=128)
    assert (fast[0] == fast[1]).all() and (fast[1] == fast[2]).all()
    assert (fast[0] != fast[3]).any()


def test_oph_identity_and_discrimination():
    docs = [["a", "b", "c", "d"], ["d", "c", "b", "a", "a"], [f"z{i}" for i in range(50)], []]
    m = kernel.oph_mins(docs, size=64, seed=0)
    assert (m[0] == m[1]).all()          # order/multiplicity invariant
    assert (m[0] != m[2]).any()
    assert (m[3] == kernel.LONG_MAX).all()
    # no empty bins after densification (docs 0-2 nonempty)
    assert (m[:3] != kernel.LONG_MAX).all()


def test_oph_char_shingle_matches_string_path():
    # includes sub-8-unit texts (bytelen < 16): their single window is a
    # murmur3 TAIL-only input, which the buffered path must not block-mix
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog " * 3,
             "totally different content here with other words entirely",
             "short", "ab", "a", "abcdefg", "abcdefgh", "abcdefghi"]
    a = kernel.oph_mins_char_shingle(texts, k=9, size=64, seed=7)
    b = kernel.oph_mins([char_shingles(t, 9) for t in texts], size=64, seed=7)
    assert (a == b).all()
    assert (a[0] == a[1]).all()
    assert (a[0] != a[2]).any()


def test_window_hashes_match_murmur_oracle_short_texts():
    # every window hash (h1 lane, seed 0) must equal murmur3_x64_128 of the
    # decoded window string — including docs shorter than 8 UTF-16 units
    texts = ["a", "ab", "abc", "abcdefg", "abcdefgh", "abcdefghi",
             "hello world this is long enough to have many windows"]
    batch = kernel._ShingleBatch(texts, 9)
    h1, _ = kernel._window_hashes_seed0(batch)
    blens = batch.bytelens()
    import numpy as np
    for i in range(len(batch.starts)):
        s = batch.window_string(int(batch.starts[i]), int(blens[i]))
        expect = kernel.murmur3_x64_128_h1(s.encode("utf-16-le"), 0)
        assert int(np.array(h1[i]).view(np.int64)) == expect, (i, s)


def test_oph_jaccard_estimator():
    # J = 1/3: estimate via fraction of equal OPH slots
    a = [f"s{i}" for i in range(100)] + [f"a{i}" for i in range(100)]
    b = [f"s{i}" for i in range(100)] + [f"b{i}" for i in range(100)]
    m = kernel.oph_mins([a, b], size=1024, seed=0)
    est = float((m[0] == m[1]).mean())
    assert abs(est - 1 / 3) < 0.08


def test_suggest_bands_properties():
    """Planner invariants: recall bound holds at the threshold, r maximal,
    and the pipeline's hand-tuned 21x6 falls out of (128, 0.8)."""
    from minhash_spark.config import suggest_bands

    assert suggest_bands(128, 0.8) == (21, 6)
    for size, t in [(128, 0.5), (128, 0.9), (64, 0.8), (32, 0.7)]:
        b, r = suggest_bands(size, t)
        recall = 1 - (1 - t**r) ** b
        assert recall >= 0.99
        assert b * r <= size
        # maximality: one more row per band would break the recall bound
        b2 = size // (r + 1)
        if b2 >= 1:
            assert 1 - (1 - t ** (r + 1)) ** b2 < 0.99
    import pytest

    with pytest.raises(ValueError):
        suggest_bands(128, 1.5)
    with pytest.raises(ValueError):
        suggest_bands(1, 0.01)  # unreachable recall


def test_grouping_schemes_value_identical():
    """'murmur' (parallel-safe default) and 'rolling' (serial-fast) window
    grouping must produce byte-identical minima, with and without the
    boilerplate exclusion filter; OPH likewise for direct vs rolling."""
    import numpy as np

    from minhash_spark import kernel

    texts = [
        "def foo():  return 1\n\nclass Bar: pass",
        "def foo():  return 1\n\nclass Bar: pass",
        "completely different content here with words",
        "short",
        "",
        "ab",
        "é" * 12 + " mixed ascii tail",
    ]
    a = kernel.minhash_mins_char_shingle(texts, k=9, seed=7, size=64, group="murmur")
    b = kernel.minhash_mins_char_shingle(texts, k=9, seed=7, size=64, group="rolling")
    assert np.array_equal(a, b)
    batch = kernel._ShingleBatch(texts, 9)
    h = kernel.window_h1_seed0(batch)
    assert np.array_equal(h, kernel.window_h1_seed0(batch, group="rolling"))
    hot = np.sort(np.unique(h))[:5]
    a = kernel.minhash_mins_char_shingle(
        texts, k=9, seed=0, size=64, exclude_sorted=hot, group="murmur"
    )
    b = kernel.minhash_mins_char_shingle(
        texts, k=9, seed=0, size=64, exclude_sorted=hot, group="rolling"
    )
    assert np.array_equal(a, b)
    a = kernel.oph_mins_char_shingle(texts, k=9, size=64, seed=3, exclude_sorted=hot)
    b = kernel.oph_mins_char_shingle(
        texts, k=9, size=64, seed=3, exclude_sorted=hot, group="rolling"
    )
    assert np.array_equal(a, b)


def test_rolling_key_primitives():
    """_pow_array matches python pow; _roll_base matches direct polynomial
    evaluation; distinct windows get distinct keys (no aliasing across
    window lengths or leading NULs)."""
    import numpy as np

    from minhash_spark import kernel

    for n in (0, 1, 5, 2048, 2049, 5000):
        arr = kernel._pow_array(kernel._RB1, n)
        assert len(arr) == n
        for j in (0, 1, 2, n - 1, n // 2):
            if 0 <= j < n:
                assert int(arr[j]) == pow(int(kernel._RB1), j, 1 << 64)
    # direct polynomial check on a tiny buffer
    u = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.uint64)
    starts = np.array([0, 2, 4], dtype=np.int64)
    ends = np.array([3, 5, 8], dtype=np.int64)
    got = kernel._roll_base(u, starts, ends, kernel._RB1, kernel._RB1_INV)
    m = 1 << 64
    b = int(kernel._RB1)
    for i, (s, e) in enumerate(zip(starts, ends)):
        h = 0
        for j in range(s, e):
            h = (h * b + int(u[j])) % m
        assert int(got[i]) == h
    # length mixing: "x" (1 unit) vs "\0x" (leading NUL) must not collide
    batch = kernel._ShingleBatch(["x", "\0x"], 9)
    r1, _ = kernel._window_roll_keys(batch)
    assert r1[0] != r1[1]


def test_kernel_group_is_physical_only():
    """Flipping the window-grouping knob must not invalidate checkpoints
    (config_hash) or signature identity; invalid values fail at build."""
    from minhash_spark.config import MinHashConfig

    a = MinHashConfig(tokenizer="char_shingle", tokenizer_params={"k": 9})
    b = MinHashConfig(
        tokenizer="char_shingle", tokenizer_params={"k": 9}, kernel_group="rolling"
    )
    assert a.config_hash() == b.config_hash()
    assert a.signature_hash() == b.signature_hash()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="kernel_group"):
        MinHashConfig(kernel_group="nope").validate()


def test_chunked_fold_matches_dense_path(monkeypatch):
    """Low-dedup batches overflow _UNIQ_FOLD_CHUNK and take the chunked
    min-reduce; results must equal the dense fold exactly (with and without
    exclusion, both grouping schemes)."""
    import numpy as np

    from minhash_spark import kernel

    rng = np.random.default_rng(11)
    texts = [
        "".join(chr(int(c)) for c in rng.integers(97, 123, int(rng.integers(0, 300))))
        for _ in range(120)
    ]
    texts += ["", "ab", "shared boilerplate " * 20, "shared boilerplate " * 20]
    dense = kernel.minhash_mins_char_shingle(texts, k=9, seed=5, size=48)
    batch = kernel._ShingleBatch(texts, 9)
    hot = np.sort(np.unique(kernel.window_h1_seed0(batch)))[:200]
    dense_ex = kernel.minhash_mins_char_shingle(
        texts, k=9, seed=5, size=48, exclude_sorted=hot
    )
    monkeypatch.setattr(kernel, "_UNIQ_FOLD_CHUNK", 257)
    for group in ("murmur", "rolling"):
        got = kernel.minhash_mins_char_shingle(texts, k=9, seed=5, size=48, group=group)
        assert np.array_equal(got, dense), group
        got = kernel.minhash_mins_char_shingle(
            texts, k=9, seed=5, size=48, exclude_sorted=hot, group=group
        )
        assert np.array_equal(got, dense_ex), group


def test_exclusion_dropped_before_fold():
    """A doc whose every shingle is excluded yields the all-LONG_MAX
    empty-stream row (pre-fold drop semantics == old post-fold overwrite)."""
    import numpy as np

    from minhash_spark import kernel

    texts = ["aaaaaaaaaaaa", "unrelated other content"]
    batch = kernel._ShingleBatch(texts[:1], 9)
    hot = np.sort(np.unique(kernel.window_h1_seed0(batch)))
    mins = kernel.minhash_mins_char_shingle(texts, k=9, seed=0, size=32, exclude_sorted=hot)
    assert (mins[0] == kernel.LONG_MAX).all()
    assert (mins[1] != kernel.LONG_MAX).any()


def test_mapping_char_filter_validation():
    """Bad 'mapping' specs must fail at config build on the driver, not as a
    KeyError inside an executor UDF batch."""
    import pytest

    from minhash_spark.config import MinHashConfig

    with pytest.raises(ValueError, match="mapping"):
        MinHashConfig(
            tokenizer="standard", tokenizer_params={"char_filters": ["mapping"]}
        ).validate()
    with pytest.raises(ValueError, match="from=>to"):
        MinHashConfig(
            tokenizer="standard",
            tokenizer_params={"char_filters": [("mapping", {"mappings": ["no-arrow"]})]},
        ).validate()
    ok = MinHashConfig(
        tokenizer="standard",
        tokenizer_params={"char_filters": [("mapping", {"mappings": ["a=>b"]})]},
    ).validate()
    assert ok is not None
    with pytest.raises(ValueError, match="char_shingle"):
        MinHashConfig(
            tokenizer="char_shingle", tokenizer_params={"filters": ["lowercase"]}
        ).validate()


def test_char_filters_respected_on_char_shingle_kernel_path():
    """char_filters configured with tokenizer='char_shingle' must change the
    computed signatures (parity with the string path, which applies them in
    make_tokenizer) — not be silently ignored by the kernel fast path."""
    import pandas as pd

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import _compute_mins
    from minhash_spark import kernel
    from minhash_spark.tokenize import make_tokenizer

    texts = pd.Series(["<div>hello world content</div> more text here", "plain text no markup at all"])
    plain = MinHashConfig(tokenizer="char_shingle", tokenizer_params={"k": 9})
    strip = MinHashConfig(
        tokenizer="char_shingle",
        tokenizer_params={"k": 9, "char_filters": ["html_strip"]},
    )
    m_plain, _ = _compute_mins(texts, plain)
    m_strip, _ = _compute_mins(texts, strip)
    assert (m_plain[0] != m_strip[0]).any()  # markup doc: filter changes shingles
    # parity with the string path (filter applied, then shingled)
    tok = make_tokenizer("char_shingle", k=9, char_filters=["html_strip"])
    import numpy as np

    exp = kernel.minhash_mins([list(set(tok(texts[0])))], seed=0, size=128)[0]
    assert np.array_equal(m_strip[0], exp)


def test_word_delimiter_filter_identifier_splitting():
    """Lucene word_delimiter_graph analog for source code: camelCase,
    PascalCase, snake_case, acronym runs, and alpha<->digit transitions all
    split into sub-words; a renamed-identifier fork shares sub-word tokens."""
    from minhash_spark.tokenize import make_tokenizer

    an = make_tokenizer("word", filters=["word_delimiter", "lowercase"])
    assert an("getHTTPResponseCode") == ["get", "http", "response", "code"]
    assert an("snake_case_name") == ["snake", "case", "name"]
    assert an("PascalCase x86 v2") == ["pascal", "case", "x", "86", "v", "2"]
    assert an("HTTPServer") == ["http", "server"]
    # the canonical rename-equivalence: camelCase vs snake_case tokenize
    # identically after the chain
    assert an("getHttpResponse") == an("get_http_response")
    # preserve_original keeps the unsplit identifier alongside the parts
    an2 = make_tokenizer(
        "word", filters=[("word_delimiter", {"preserve_original": True})]
    )
    assert an2("fooBar") == ["fooBar", "foo", "Bar"]
    assert an2("plain") == ["plain"]
    # non-ASCII runs pass through the FILTER whole (no spurious splits inside
    # CJK; the standard tokenizer keeps mixed-script \w runs as one token)
    an3 = make_tokenizer("standard", filters=["word_delimiter", "lowercase"])
    assert an3("ascii日本語mix") == ["ascii", "日本語", "mix"]
    # chain participates in config identity
    from minhash_spark.config import MinHashConfig

    a = MinHashConfig(tokenizer="word",
                      tokenizer_params={"filters": ["word_delimiter"]})
    b = MinHashConfig(tokenizer="word")
    assert a.config_hash() != b.config_hash()


def test_factorize_injective_on_embedded_nul():
    """pandas' StringHashTable hashes object-dtype strings as NUL-terminated
    C strings, collapsing '' / '\\x00' and 'a\\x00b' / 'a\\x00c' to one id —
    which silently corrupted signatures of NUL-bearing (binary-ish) files.
    Found by hypothesis; pinned here explicitly."""
    docs = [["", "\x00"], ["a\x00b", "a\x00c", "a"], ["a"]]
    uniq, tok_ids, counts = kernel._factorize_tokens(docs)
    assert len(uniq) == 5  # all five distinct strings survive
    # and the signature equals the pure-Python oracle per doc
    mins = kernel.minhash_mins(docs, seed=0, size=6)
    packed = kernel.pack_bbit(mins, bit=1)
    for i, toks in enumerate(docs):
        assert packed[i].tobytes() == kernel.minhash_signature_oracle(toks, 0, 6, 1)


def test_standard_tokens_uax29_wb4_and_max_length():
    """UAX#29 WB4: Extend (combining marks) and Format (ZWJ/ZWNJ, soft
    hyphen, bidi controls) are transparent inside a word run; Lucene's
    default 255-char token cap splits over-long runs."""
    from minhash_spark.tokenize import standard_tokens

    # combining acute (Extend) attaches to the word, both NFC and NFD forms
    assert standard_tokens("café menu") == ["café", "menu"]
    assert standard_tokens("café menu") == ["café", "menu"]
    # ZWJ / ZWNJ (Format) mid-word do not split
    assert standard_tokens("ab‍cd ef") == ["ab‍cd", "ef"]
    assert standard_tokens("ab‌cd") == ["ab‌cd"]
    # soft hyphen (Format) mid-word
    assert standard_tokens("hy­phen") == ["hy­phen"]
    # emoji ZWJ sequence between words: emoji are not word chars; neighbors
    # tokenize cleanly and the ZWJ does not glue them together
    assert standard_tokens("abc \U0001F469‍\U0001F4BB def") == ["abc", "def"]
    # a lone combining mark / format char is not a token
    assert standard_tokens(" ́ ‍ ") == []
    # mixed scripts with marks: devanagari matra (Mc) stays in the word
    assert standard_tokens("नमस्ते hello") == [
        "नमस्ते",
        "hello",
    ]
    # max_token_length: 600-char run splits 255/255/90 (Lucene default)
    assert [len(t) for t in standard_tokens("x" * 600)] == [255, 255, 90]
    assert standard_tokens("x" * 600, max_token_length=100) == ["x" * 100] * 6
    # the cap counts UTF-16 code units like Lucene's maxTokenLength (Java
    # chars), not codepoints: a supplementary-plane char costs 2 (ADVICE r3)
    astral = "\U00010400"  # DESERET CAPITAL LONG I, Lo (word char), 2 units
    toks = standard_tokens(astral * 10, max_token_length=6)
    assert toks == [astral * 3, astral * 3, astral * 3, astral]
    # mixed BMP+astral: split point lands where the UNIT budget runs out,
    # never inside a codepoint
    toks = standard_tokens("aaaa" + astral * 3, max_token_length=5)
    assert toks == ["aaaa", astral * 2, astral]
    # codepoint count may exceed the cap when units do not
    assert standard_tokens("a" * 7, max_token_length=7) == ["a" * 7]
    # fixture behavior unchanged
    assert standard_tokens("test 1") == ["test", "1"]
    assert standard_tokens("don't stop 3.14 1,000") == ["don't", "stop", "3.14", "1,000"]


def test_standard_tokens_wb4_properties():
    """Property: inserting an Extend/Format char INSIDE any word token never
    changes the token count, and stripping marks recovers the base tokens."""
    import unicodedata

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from minhash_spark.tokenize import standard_tokens

    words = st.lists(
        st.text(alphabet="abcdefgh0123", min_size=1, max_size=8), min_size=1, max_size=6
    )
    marks = st.sampled_from(["́", "̈", "‍", "‌", "­"])

    @settings(max_examples=60, deadline=None)
    @given(words, marks, st.integers(min_value=1, max_value=100))
    def prop(ws, mark, seed):
        text = " ".join(ws)
        base = standard_tokens(text)
        w = ws[seed % len(ws)]
        if len(w) < 2:
            return
        pos = 1 + (seed % (len(w) - 1)) if len(w) > 1 else 1
        marked = w[:pos] + mark + w[pos:]
        text2 = " ".join(marked if i == seed % len(ws) else x for i, x in enumerate(ws))
        got = standard_tokens(text2)
        assert len(got) == len(base)
        stripped = [
            "".join(c for c in t if not unicodedata.category(c) in ("Mn", "Cf"))
            for t in got
        ]
        assert stripped == base

    prop()


def test_config_merge_mapping_semantics():
    """O19 mapping-merge analog: query-side knob updates merge in place;
    signature-determining changes conflict with an ES-style error naming
    every offending parameter."""
    import pytest

    from minhash_spark.config import MinHashConfig

    base = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    # compatible: verify/skew knobs change, stored bytes stay valid
    upd = MinHashConfig(
        seed=0, size=128, bit=1, tokenizer="word",
        verify_threshold=0.9, max_bucket_size=128, containment_threshold=0.95,
    )
    merged = base.merge(upd)
    assert merged.verify_threshold == 0.9 and merged.max_bucket_size == 128
    assert merged.signature_hash() == base.signature_hash()
    # conflict: bit and seed differ -> both named in the error
    bad = MinHashConfig(seed=7, size=128, bit=2, tokenizer="word")
    with pytest.raises(ValueError, match=r"\[seed\].*\[bit\]|\[bit\].*\[seed\]"):
        base.merge(bad)
    # conflict: analyzer chain change is not mergeable either
    bad2 = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word_shingle",
                         tokenizer_params={"n": 3})
    with pytest.raises(ValueError, match="tokenizer"):
        base.merge(bad2)
