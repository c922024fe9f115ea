"""Arrow-vectorized pandas UDFs wrapping the NumPy kernel.

These are the ONLY Python-side operators in the engine's hot path; everything
relational stays in native Catalyst expressions. Each UDF maps one Arrow batch
(pd.Series) through the batched kernel — no per-row Python.

Reference parity:
  * ``minhash_struct_udf`` re-expresses the analyzer -> MinHashTokenFilter ->
    encode chain (MinHashFieldMapper.java:252-295) as one vectorized pass that
    also emits the LSH band keys (our pipeline addition, SURVEY §2.3 P4).
  * ``sig_b64`` matches the plugin's default surface encoding
    (MinHashFieldMapper.java:276-277) including BitSet trailing-zero truncation.
  * ``bit_string`` matches MinHashFieldMapper.java:273-274.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from minhash_spark.config import MinHashConfig
from minhash_spark import kernel
from minhash_spark.tokenize import make_tokenizer

SIG_STRUCT_TYPE = T.StructType(
    [
        T.StructField("sig", T.BinaryType()),
        T.StructField("sig_b64", T.StringType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]
)


def _compute_mins(texts: pd.Series, cfg: MinHashConfig) -> np.ndarray:
    vals = texts.fillna(cfg.null_value) if cfg.null_value is not None else texts
    mask = vals.notna().to_numpy()
    str_list = vals.fillna("").astype(str).tolist()
    if cfg.tokenizer == "char_shingle":
        k = cfg.tokenizer_params.get("k", 9)
        mins = kernel.minhash_mins_char_shingle(str_list, k=k, seed=cfg.seed, size=cfg.size)
    else:
        tok = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)
        mins = kernel.minhash_mins([tok(s) for s in str_list], seed=cfg.seed, size=cfg.size)
    return mins, mask


def minhash_struct_udf(cfg: MinHashConfig):
    """content -> struct(sig binary, sig_b64 string, bands array<long>).

    One kernel pass computes the minima; signature packing and band hashing
    reuse them (never recomputed). Null content (after null_value coalescing,
    MinHashFieldMapper.java:260-269) yields a null struct fieldset.
    """
    cfg.validate()

    @pandas_udf(SIG_STRUCT_TYPE)
    def _udf(texts: pd.Series) -> pd.DataFrame:
        mins, mask = _compute_mins(texts, cfg)
        packed = kernel.pack_bbit(mins, bit=cfg.bit)
        bands = kernel.band_keys(mins, cfg.num_bands, cfg.rows_per_band)
        sig_col = [packed[i].tobytes() if mask[i] else None for i in range(len(texts))]
        b64_col = [kernel.to_base64(packed[i].tobytes()) if mask[i] else None for i in range(len(texts))]
        band_col = [bands[i] if mask[i] else None for i in range(len(texts))]
        return pd.DataFrame({"sig": sig_col, "sig_b64": b64_col, "bands": band_col})

    return _udf


def minhash_b64_udf(cfg: MinHashConfig):
    """content -> reference-encoded base64 signature string (compat surface)."""
    cfg.validate()

    @pandas_udf(T.StringType())
    def _udf(texts: pd.Series) -> pd.Series:
        mins, mask = _compute_mins(texts, cfg)
        packed = kernel.pack_bbit(mins, bit=cfg.bit)
        return pd.Series(
            [kernel.to_base64(packed[i].tobytes()) if mask[i] else None for i in range(len(texts))]
        )

    return _udf


def minhash_bitstring_udf(cfg: MinHashConfig):
    """content -> '0'/'1' string (bit_string:true surface encoding)."""
    cfg.validate()

    @pandas_udf(T.StringType())
    def _udf(texts: pd.Series) -> pd.Series:
        mins, mask = _compute_mins(texts, cfg)
        packed = kernel.pack_bbit(mins, bit=cfg.bit)
        return pd.Series(
            [kernel.to_bit_string(packed[i].tobytes()) if mask[i] else None for i in range(len(texts))]
        )

    return _udf


def sig_bitmatch_udf():
    """(sig_a, sig_b) -> fraction of equal bits (MinHash.compare, SURVEY §2.1.6).
    Vectorized XOR + popcount over the whole batch."""

    @pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.full(len(a), np.nan)
        an, bn = a.to_numpy(), b.to_numpy()
        widths: dict[int, list[int]] = {}
        for i in range(len(an)):
            if an[i] is not None and bn[i] is not None and len(an[i]) == len(bn[i]) and len(an[i]) > 0:
                widths.setdefault(len(an[i]), []).append(i)
        for w, idxs in widths.items():
            A = np.frombuffer(b"".join(an[i] for i in idxs), dtype=np.uint8).reshape(len(idxs), w)
            B = np.frombuffer(b"".join(bn[i] for i in idxs), dtype=np.uint8).reshape(len(idxs), w)
            diff = np.unpackbits(A ^ B, axis=1).sum(axis=1)
            out[idxs] = 1.0 - diff / (8.0 * w)
        return pd.Series(out)

    return _udf


def jaccard_udf(cfg: MinHashConfig):
    """(content_a, content_b) -> exact token-set Jaccard (verification stage).

    Token sets are built with the SAME tokenizer config as the signatures, so
    the verified threshold is in signature space. Batched: both sides'
    tokens are hashed once (64-bit), per-pair intersection via sorted merge.
    """
    cfg.validate()
    tok = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)

    @pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a))
        for i in range(len(a)):
            sa, sb = a.iat[i], b.iat[i]
            if sa is None or sb is None:
                out[i] = 0.0
                continue
            ta, tb = set(tok(sa)), set(tok(sb))
            if not ta and not tb:
                out[i] = 1.0
            else:
                u = len(ta | tb)
                out[i] = len(ta & tb) / u if u else 0.0
        return pd.Series(out)

    return _udf


def simhash_udf(cfg: MinHashConfig):
    """content -> 64-bit SimHash (engine extension, token-multiset charikar)."""
    tok = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)

    @pandas_udf(T.LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        docs = [tok(s) if s is not None else [] for s in texts]
        return pd.Series(kernel.simhash64(docs))

    return _udf


def file_id_col(repo="repo", path="path", commit="commit"):
    """Deterministic row identity (FIXTURES.md §1)."""
    return F.sha2(F.concat_ws("", F.col(repo), F.col(path), F.col(commit)), 256)
