"""UDF surface tests: null handling (null_value param), signature bit-match,
simhash column, DF-filter plumbing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import (
    jaccard_udf,
    minhash_b64_udf,
    minhash_struct_udf,
    sig_bitmatch_udf,
    simhash_udf,
)
from minhash_spark import kernel


def test_null_value_replacement(spark):
    # MinHashFieldMapper.java:260-269 — null -> null_value replacement string
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word", null_value="test 1")
    df = spark.createDataFrame([("test 1",), (None,)], ["content"])
    rows = df.select(minhash_b64_udf(cfg)(F.col("content")).alias("b64")).collect()
    assert rows[0]["b64"] == rows[1]["b64"] == "Uji99jenq7da3aNKTYc8yQ=="


def test_null_without_null_value_is_skipped(spark):
    # null_value also null -> field skipped (sig null)
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    df = spark.createDataFrame([("test 1",), (None,)], ["content"])
    rows = df.select(minhash_struct_udf(cfg)(F.col("content")).alias("s")).collect()
    assert rows[0]["s"]["sig"] is not None
    assert rows[1]["s"]["sig"] is None and rows[1]["s"]["sig_b64"] is None


def test_sig_bitmatch_matches_kernel_compare(spark):
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    texts = ["a b c d e", "a b c d x", "q r s t u"]
    mins = kernel.minhash_mins([t.split() for t in texts], seed=0, size=128)
    packed = kernel.pack_bbit(mins, 1)
    df = spark.createDataFrame(
        [(packed[0].tobytes(), packed[1].tobytes()), (packed[0].tobytes(), packed[2].tobytes())],
        ["a", "b"],
    )
    got = [r["m"] for r in df.select(sig_bitmatch_udf()(F.col("a"), F.col("b")).alias("m")).collect()]
    assert got[0] == kernel.compare(packed[0].tobytes(), packed[1].tobytes())
    assert got[1] == kernel.compare(packed[0].tobytes(), packed[2].tobytes())


def test_jaccard_udf_exact_values(spark):
    cfg = MinHashConfig(tokenizer="word_shingle", tokenizer_params={"n": 3})
    df = spark.createDataFrame(
        [("a b c d", "a b c d"), ("a b c d", "x y z w"), ("a b c d e", "a b c d x")],
        ["x", "y"],
    )
    got = [r["j"] for r in df.select(jaccard_udf(cfg)(F.col("x"), F.col("y")).alias("j")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    # shingles of 'a b c d e' = {abc,bcd,cde}; of 'a b c d x' = {abc,bcd,cdx}
    assert abs(got[2] - 2 / 4) < 1e-12


def test_jaccard_char_path_with_exclude(spark):
    cfg = MinHashConfig(tokenizer="char_shingle", tokenizer_params={"k": 3})
    # without filter: J < 1; excluding the shared prefix shingles -> differs
    a, b = "HDR body one", "HDR body two"
    df = spark.createDataFrame([(a, b)], ["x", "y"])
    j_raw = df.select(jaccard_udf(cfg)(F.col("x"), F.col("y")).alias("j")).first()["j"]
    batch = kernel._ShingleBatch(["HDR body "], 3)
    hdr = np.sort(np.unique(kernel._window_hashes_seed0(batch)[0].view(np.int64)))
    j_f = df.select(jaccard_udf(cfg, exclude_sorted=hdr)(F.col("x"), F.col("y")).alias("j")).first()["j"]
    assert 0 < j_raw < 1
    assert j_f < j_raw  # shared boilerplate no longer counts toward similarity


def test_simhash_udf_column(spark):
    cfg = MinHashConfig(tokenizer="word")
    df = spark.createDataFrame([("a b c",), ("a b c",), ("z q",)], ["content"])
    got = [r["s"] for r in df.select(simhash_udf(cfg)(F.col("content")).alias("s")).collect()]
    assert got[0] == got[1] != got[2]


def test_struct_udf_exclude_changes_sig(spark):
    cfg = MinHashConfig(tokenizer="char_shingle", tokenizer_params={"k": 3})
    df = spark.createDataFrame([("HDR body one",)], ["content"])
    s1 = df.select(minhash_struct_udf(cfg)(F.col("content")).alias("s")).first()["s"]
    batch = kernel._ShingleBatch(["HDR "], 3)
    hdr = np.sort(np.unique(kernel._window_hashes_seed0(batch)[0].view(np.int64)))
    s2 = df.select(minhash_struct_udf(cfg, exclude_sorted=hdr)(F.col("content")).alias("s")).first()["s"]
    assert s1["sig"] != s2["sig"]


def test_similarity_udf_containment(spark):
    from minhash_spark.functions.udfs import similarity_udf
    from pyspark.sql import functions as F2

    cfg = MinHashConfig(tokenizer="word")
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(small, big)], ["x", "y"])
    r = df.select(similarity_udf(cfg)(F2.col("x"), F2.col("y")).alias("s")).first()["s"]
    assert r["containment"] == 1.0           # small fully inside big
    assert r["jaccard"] < 0.15               # but jaccard is low


def test_verify_containment_acceptance(spark):
    from minhash_spark.operators.verify import verify_pairs
    from pyspark.sql import functions as F2
    from minhash_spark import kernel

    cfg = MinHashConfig(
        tokenizer="char_shingle", tokenizer_params={"k": 5},
        verify_threshold=0.9, containment_threshold=0.95,
    )
    small = "the quick brown fox jumps over the lazy dog again and again"
    big = small + " " + "totally different suffix content here " * 6
    mins = kernel.minhash_mins_char_shingle([small, big], k=5, seed=0, size=128)
    packed = kernel.pack_bbit(mins, 1)
    sigs = spark.createDataFrame(
        [("a", bytearray(packed[0].tobytes())), ("b", bytearray(packed[1].tobytes()))],
        "rep_id string, sig binary",
    )
    contents = spark.createDataFrame([("a", small), ("b", big)], "rep_id string, content string")
    pairs = spark.createDataFrame([("a", "b")], "a_id string, b_id string")
    out = verify_pairs(pairs, sigs, contents, cfg).collect()
    assert len(out) == 1                      # accepted via containment
    assert out[0]["containment"] >= 0.95
    assert out[0]["jaccard"] < 0.9

    cfg_off = MinHashConfig(
        tokenizer="char_shingle", tokenizer_params={"k": 5}, verify_threshold=0.9
    )
    assert verify_pairs(pairs, sigs, contents, cfg_off).count() == 0


def test_substring_verify_rejects_shuffled_accepts_verbatim(spark):
    """North-rule substring check: a shuffled-shingle 'containment' pair is
    NOT a real embedding and must be rejected when substring_verify is on,
    while a verbatim embedding still passes."""
    from pyspark.sql import functions as F2

    from minhash_spark import kernel
    from minhash_spark.operators.verify import verify_pairs

    cfg = MinHashConfig(
        tokenizer="word", verify_threshold=0.95,
        containment_threshold=0.95, substring_verify=True,
    )
    words = [f"tok{i}" for i in range(40)]
    small = " ".join(words)
    big_verbatim = "prefix filler " + small + " suffix filler " + " ".join(f"z{i}" for i in range(40))
    # same word SET (containment 1.0 at set level) but scrambled order:
    big_shuffled = "prefix filler " + " ".join(reversed(words)) + " suffix filler " + " ".join(
        f"z{i}" for i in range(40)
    )

    def run(big):
        docs = [(1, small), (2, big)]
        mins = kernel.minhash_mins([r[1].split() for r in docs], seed=0, size=128)
        packed = kernel.pack_bbit(mins, 1)
        sigs = spark.createDataFrame(
            [(str(i + 1), bytearray(packed[i].tobytes())) for i in range(2)],
            "rep_id string, sig binary",
        )
        contents = spark.createDataFrame(
            [(str(d), t) for d, t in docs], "rep_id string, content string"
        )
        pairs = spark.createDataFrame([("1", "2")], "a_id string, b_id string")
        return verify_pairs(pairs, sigs, contents, cfg).collect()

    assert len(run(big_verbatim)) == 1
    assert len(run(big_shuffled)) == 0


def test_signature_for_text_matches_udf(spark):
    """Driver-side query signature must be byte-identical to the indexed one
    (the search CLI's correctness contract)."""
    import pyspark.sql.functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import minhash_struct_udf, signature_for_text

    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="char_shingle",
                        tokenizer_params={"k": 9})
    texts = ["some source file content for the search path", "minhash is fun"]
    udf = minhash_struct_udf(cfg)
    rows = (
        spark.createDataFrame([(t,) for t in texts], "content string")
        .select(udf(F.col("content")).alias("s"))
        .select("s.sig", "s.bands")
        .collect()
    )
    for t, r in zip(texts, rows):
        sig, bands = signature_for_text(t, cfg)
        assert bytes(r["sig"]) == sig
        assert list(r["bands"]) == bands


def test_search_signatures_modes(spark):
    """LSH mode must find the verbatim doc at bit_match 1.0, brute must rank
    it first too, and exact mode must return exactly the byte-identical row."""
    import pyspark.sql.functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import minhash_struct_udf, signature_for_text
    from minhash_spark.plans.search import search_signatures

    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word_shingle",
                        tokenizer_params={"n": 3}, num_bands=32, rows_per_band=4)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    corpus = [
        ("d1", base),
        ("d2", base + " lambda mu"),  # near-dup of d1
        ("d3", "totally different words nothing shared here at all ever " * 3),
    ]
    udf = minhash_struct_udf(cfg)
    sigs = (
        spark.createDataFrame(corpus, "rep_id string, content string")
        .select("rep_id", udf(F.col("content")).alias("s"))
        .select("rep_id", F.col("s.sig").alias("sig"), F.col("s.bands").alias("bands"))
    )
    qsig, qbands = signature_for_text(base, cfg)

    lsh = search_signatures(sigs, qsig, qbands, top_k=3, mode="lsh", bit=1).collect()
    assert lsh[0]["rep_id"] == "d1" and lsh[0]["bit_match"] == 1.0
    assert lsh[0]["est_jaccard"] == 1.0
    lsh_ids = {r["rep_id"] for r in lsh}
    assert "d2" in lsh_ids  # near-dup shares bands
    assert "d3" not in lsh_ids  # unrelated doc pruned by the band predicate

    brute = search_signatures(sigs, qsig, qbands, top_k=3, mode="brute", bit=1).collect()
    assert brute[0]["rep_id"] == "d1" and len(brute) == 3  # scores all rows

    exact = search_signatures(sigs, qsig, qbands, mode="exact").collect()
    assert [r["rep_id"] for r in exact] == ["d1"]


def test_sql_surface_matches_dataframe_api(spark):
    """spark.sql results through the registered functions must be
    byte-identical to the DataFrame-API UDFs (same kernels)."""
    import pyspark.sql.functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.sql import register_sql_functions
    from minhash_spark.functions.udfs import minhash_b64_udf

    register_sql_functions(spark)
    docs = spark.createDataFrame(
        [(1, "test 1"), (2, "test 2"), (3, "minhash from sql")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("sql_docs")
    via_sql = {r["doc_id"]: r["sig"] for r in
               spark.sql("SELECT doc_id, minhash_b64(text) AS sig FROM sql_docs").collect()}
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    b64 = minhash_b64_udf(cfg)
    via_df = {r["doc_id"]: r["sig"] for r in
              docs.select("doc_id", b64(F.col("text")).alias("sig")).collect()}
    assert via_sql == via_df
    # golden vector (reference default config, MinHashPluginTest.java:163)
    assert via_sql[1] == "Uji99jenq7da3aNKTYc8yQ=="
    # bitmatch self-compare through SQL = 1.0
    spark.sql(
        "SELECT minhash_bitmatch(unbase64(minhash_b64(text)), unbase64(minhash_b64(text))) AS m "
        "FROM sql_docs"
    ).collect()
    sh = spark.sql("SELECT simhash64(text) AS h FROM sql_docs").collect()
    assert all(r["h"] is not None for r in sh)


def test_sql_bitstring_matches_dataframe_and_golden(spark):
    """minhash_bitstring on the SQL surface (the reference's bit_string:true
    mapping parameter, MinHashFieldMapper.java:273-274) must be byte-equal to
    the DataFrame UDF AND consistent with the b64 encoding of the same
    signature (bit i of the unpacked bytes == char i of the bit string)."""
    import base64

    import pyspark.sql.functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.sql import register_sql_functions
    from minhash_spark.functions.udfs import minhash_bitstring_udf

    register_sql_functions(spark)
    docs = spark.createDataFrame(
        [(1, "test 1"), (2, "test 2"), (3, "minhash from sql")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("sql_docs_bits")
    via_sql = {r["doc_id"]: r["bits"] for r in
               spark.sql("SELECT doc_id, minhash_bitstring(text) AS bits "
                         "FROM sql_docs_bits").collect()}
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    bits = minhash_bitstring_udf(cfg)
    via_df = {r["doc_id"]: r["b"] for r in
              docs.select("doc_id", bits(F.col("text")).alias("b")).collect()}
    assert via_sql == via_df
    # cross-encoding consistency with the golden b64 vector for "test 1"
    # (bit string renders bytes MSB-first, kernel.to_bit_string)
    raw = base64.b64decode("Uji99jenq7da3aNKTYc8yQ==")
    expect = "".join(f"{b:08b}" for b in raw)
    assert via_sql[1] == expect[: len(via_sql[1])]


def test_multi_config_chunked_fold_parity(monkeypatch):
    """The copy_to fan-out must produce identical minima when its vocabulary
    overflows _UNIQ_FOLD_CHUNK and takes the chunked min-reduce. Calls the
    plain helper directly (a driver-side monkeypatch cannot reach Spark's
    Python worker processes, so testing through the UDF would be vacuous)."""
    import numpy as np

    from minhash_spark import kernel
    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import _multi_config_mins

    cfgs = [
        MinHashConfig(seed=0, size=32, bit=1, tokenizer="word",
                      num_bands=8, rows_per_band=4),
        MinHashConfig(seed=77, size=16, bit=2, tokenizer="word",
                      num_bands=4, rows_per_band=4),
    ]
    rng = np.random.default_rng(9)
    texts = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 400, 30))
        for _ in range(40)
    ] + ["", "solo"]

    dense = _multi_config_mins(texts, cfgs)
    assert dense.shape == (len(texts), 48)
    monkeypatch.setattr(kernel, "_UNIQ_FOLD_CHUNK", 37)
    chunked = _multi_config_mins(texts, cfgs)
    np.testing.assert_array_equal(dense, chunked)
    # per-config parity vs the single-config kernel path
    monkeypatch.setattr(kernel, "_UNIQ_FOLD_CHUNK", 1 << 20)
    from minhash_spark.tokenize import make_tokenizer

    tok = make_tokenizer("word")
    solo = kernel.minhash_mins([tok(t) for t in texts], seed=77, size=16)
    np.testing.assert_array_equal(dense[:, 32:], solo)


def test_search_est_jaccard_uses_bit_independent_inversion(spark):
    """est_jaccard must invert PER-BIT match as 2p-1 (kernel.estimate_jaccard)
    at EVERY bit width — the per-block 2^-bit figure is a different statistic
    and overestimated est_jaccard for bit>1 indexes."""
    import pyspark.sql.functions as F

    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import minhash_struct_udf, signature_for_text
    from minhash_spark.plans.search import search_signatures

    cfg = MinHashConfig(seed=0, size=64, bit=4, tokenizer="word_shingle",
                        tokenizer_params={"n": 3}, num_bands=16, rows_per_band=4)
    corpus = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta " * 4),
        ("d2", "alpha beta gamma delta epsilon zeta eta iota " * 4),
        ("d3", "unrelated words entirely different from the others here " * 4),
    ]
    udf = minhash_struct_udf(cfg)
    sigs = (
        spark.createDataFrame(corpus, "rep_id string, content string")
        .select("rep_id", udf(F.col("content")).alias("s"))
        .select("rep_id", F.col("s.sig").alias("sig"), F.col("s.bands").alias("bands"))
    )
    qsig, qbands = signature_for_text(corpus[0][1], cfg)
    rows = search_signatures(sigs, qsig, qbands, top_k=3, mode="brute", bit=4).collect()
    assert len(rows) == 3
    for r in rows:
        expected = round(max(0.0, min(1.0, 2.0 * r["bit_match"] - 1.0)), 6)
        assert r["est_jaccard"] == expected, (r["rep_id"], r["bit_match"], r["est_jaccard"])
    # an imperfect match must exist so the formula is actually exercised
    assert any(0.0 < r["bit_match"] < 1.0 for r in rows)
