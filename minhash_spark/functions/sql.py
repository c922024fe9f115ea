"""SQL surface: register the signature kernels as Spark SQL functions so the
whole engine is usable from ``spark.sql`` — the analog of the reference's
query-DSL surface (ES users call the minhash field from the search DSL;
Spark users call these from SQL).

    from minhash_spark.functions.sql import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT doc_id, minhash_b64(text) AS sig FROM docs")
    spark.sql("SELECT minhash_bitmatch(a.sig, b.sig) FROM ...")

All registered functions are the SAME Arrow-vectorized pandas UDFs the
DataFrame API uses — SQL-vs-DataFrame results are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from minhash_spark.config import MinHashConfig
from minhash_spark.functions.udfs import (
    minhash_b64_udf,
    minhash_bitstring_udf,
    sig_bitmatch_udf,
    simhash_udf,
)

DEFAULT_CFG = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")


def register_sql_functions(spark: SparkSession, cfg: MinHashConfig | None = None) -> None:
    """Register ``minhash_b64(text)``, ``minhash_bitstring(text)``,
    ``minhash_bitmatch(sig, sig)`` and ``simhash64(text)`` under the given
    analyzer config (reference defaults: seed=0, size=128, bit=1, word
    tokens). ``minhash_bitstring`` is the reference's ``bit_string:true``
    mapping parameter (MinHashFieldMapper.java:92-93,273-274; exercised by
    the ``minhash_value2`` field in MinHashPluginTest.java:137-141) — the
    last reference parameter to gain a SQL-surface registration."""
    cfg = (cfg or DEFAULT_CFG).validate()
    spark.udf.register("minhash_b64", minhash_b64_udf(cfg))
    spark.udf.register("minhash_bitstring", minhash_bitstring_udf(cfg))
    spark.udf.register("minhash_bitmatch", sig_bitmatch_udf())
    spark.udf.register("simhash64", simhash_udf(cfg))
