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


# cap the kernel working set per sub-batch: the k-seed scheme materializes
# (unique shingles x size) int64, so bound total input chars per kernel call
# (~150k chars -> <=150k windows -> <=150 MB at size=128) to stay inside the
# reused worker heap even with 32 concurrent workers per node.
_MAX_CHARS_PER_KERNEL_CALL = 96_000


def _slices_by_chars(str_list: list[str], max_chars: int):
    lo, acc = 0, 0
    for i, s in enumerate(str_list):
        acc += len(s)
        if acc >= max_chars and i + 1 > lo:
            yield lo, i + 1
            lo, acc = i + 1, 0
    if lo < len(str_list):
        yield lo, len(str_list)


def _compute_mins(
    texts: pd.Series, cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    vals = texts.fillna(cfg.null_value) if cfg.null_value is not None else texts
    mask = vals.notna().to_numpy()
    str_list = vals.fillna("").astype(str).tolist()
    out = np.empty((len(str_list), cfg.size), dtype=np.int64)
    oph = cfg.scheme == "oph"
    if cfg.tokenizer == "char_shingle":
        k = cfg.tokenizer_params.get("k", 9)
        for lo, hi in _slices_by_chars(str_list, _MAX_CHARS_PER_KERNEL_CALL):
            if oph:
                out[lo:hi] = kernel.oph_mins_char_shingle(
                    str_list[lo:hi], k=k, size=cfg.size, seed=cfg.seed, exclude_sorted=exclude_sorted
                )
            else:
                out[lo:hi] = kernel.minhash_mins_char_shingle(
                    str_list[lo:hi], k=k, seed=cfg.seed, size=cfg.size, exclude_sorted=exclude_sorted
                )
    else:
        tok = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)
        for lo, hi in _slices_by_chars(str_list, _MAX_CHARS_PER_KERNEL_CALL):
            toks = [tok(s) for s in str_list[lo:hi]]
            if oph:
                out[lo:hi] = kernel.oph_mins(toks, size=cfg.size, seed=cfg.seed)
            else:
                out[lo:hi] = kernel.minhash_mins(toks, seed=cfg.seed, size=cfg.size)
    return out, mask


def minhash_struct_udf(cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None):
    """content -> struct(sig binary, sig_b64 string, bands array<long>).

    One kernel pass computes the minima; signature packing and band hashing
    reuse them (never recomputed). Null content (after null_value coalescing,
    MinHashFieldMapper.java:260-269) yields a null struct fieldset.
    ``exclude_sorted``: boilerplate shingle hashes (DF skew filter).
    """
    cfg.validate()

    @pandas_udf(SIG_STRUCT_TYPE)
    def _udf(texts: pd.Series) -> pd.DataFrame:
        mins, mask = _compute_mins(texts, cfg, exclude_sorted)
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


def distinct_window_hashes_udf(cfg: MinHashConfig):
    """content -> array<long> of the doc's DISTINCT shingle hashes (h1, seed 0).
    Used by the document-frequency pass of the boilerplate-shingle filter."""
    k = cfg.tokenizer_params.get("k", 9)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        str_list = texts.fillna("").astype(str).tolist()
        batch = kernel._ShingleBatch(str_list, k)
        n = len(str_list)
        if len(batch.starts) == 0:
            return pd.Series([[] for _ in range(n)])
        h = kernel._window_hashes_seed0(batch)[0].view(np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(batch.counts, out=offs[1:])
        return pd.Series([np.unique(h[offs[d] : offs[d + 1]]) for d in range(n)])

    return _udf


SIMILARITY_TYPE = T.StructType(
    [T.StructField("jaccard", T.DoubleType()), T.StructField("containment", T.DoubleType())]
)


def similarity_udf(cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None):
    """(content_a, content_b) -> struct(jaccard, containment).

    containment = |A∩B| / min(|A|,|B|) over the same shingle sets — the
    cheap set-level stand-in for the suffix-array substring check (SURVEY
    §2.3 P6): a file embedded verbatim in a larger one has containment ~1
    even when Jaccard is low. Same batched hash machinery as jaccard_udf.
    """
    cfg.validate()
    char_path = cfg.tokenizer == "char_shingle"
    k = cfg.tokenizer_params.get("k", 9) if char_path else None
    tok = None if char_path else make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)

    @pandas_udf(SIMILARITY_TYPE)
    def _udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        n = len(a)
        jac = np.zeros(n)
        cont = np.zeros(n)
        if char_path:
            texts = a.fillna("").astype(str).tolist() + b.fillna("").astype(str).tolist()
            text_ids: dict[str, int] = {}
            idx = np.empty(2 * n, dtype=np.int64)
            for i, t in enumerate(texts):
                idx[i] = text_ids.setdefault(t, len(text_ids))
            uniq_texts = list(text_ids.keys())
            batch = kernel._ShingleBatch(uniq_texts, k)
            offs = np.zeros(len(uniq_texts) + 1, dtype=np.int64)
            np.cumsum(batch.counts, out=offs[1:])
            h = (
                kernel._window_hashes_seed0(batch)[0].view(np.int64)
                if len(batch.starts)
                else np.empty(0, dtype=np.int64)
            )
            uniq = []
            for d in range(len(uniq_texts)):
                u = np.unique(h[offs[d] : offs[d + 1]])
                if exclude_sorted is not None and len(exclude_sorted) and len(u):
                    u = u[~kernel._in_sorted(u, exclude_sorted)]
                uniq.append(u)
            for i in range(n):
                ua, ub = uniq[idx[i]], uniq[idx[n + i]]
                if len(ua) == 0 and len(ub) == 0:
                    jac[i] = cont[i] = 1.0
                    continue
                inter = len(np.intersect1d(ua, ub, assume_unique=True))
                union = len(ua) + len(ub) - inter
                jac[i] = inter / union if union else 0.0
                m = min(len(ua), len(ub))
                cont[i] = inter / m if m else 0.0
        else:
            for i in range(n):
                sa, sb = a.iat[i], b.iat[i]
                if sa is None or sb is None:
                    continue
                ta, tb = set(tok(sa)), set(tok(sb))
                if not ta and not tb:
                    jac[i] = cont[i] = 1.0
                    continue
                inter = len(ta & tb)
                union = len(ta | tb)
                jac[i] = inter / union if union else 0.0
                m = min(len(ta), len(tb))
                cont[i] = inter / m if m else 0.0
        return pd.DataFrame({"jaccard": jac, "containment": cont})

    return _udf


def jaccard_udf(cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None):
    """(content_a, content_b) -> exact token-set Jaccard (verification stage).

    Token sets are built with the SAME tokenizer config as the signatures, so
    the verified threshold is in signature space. For char shingles the whole
    batch's windows are hashed once to 128-bit keys (h1 used; collision odds
    negligible) and per-pair intersections run as sorted-array merges — no
    per-row Python string sets in the hot path.
    """
    cfg.validate()
    char_path = cfg.tokenizer == "char_shingle"
    k = cfg.tokenizer_params.get("k", 9) if char_path else None
    tok = None if char_path else make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)

    @pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        out = np.zeros(n)
        if char_path:
            # candidate pairs repeat the same docs many times (a cluster of m
            # members contributes C(m,2) pairs): hash each DISTINCT text once
            texts = a.fillna("").astype(str).tolist() + b.fillna("").astype(str).tolist()
            text_ids: dict[str, int] = {}
            idx = np.empty(2 * n, dtype=np.int64)
            for i, t in enumerate(texts):
                idx[i] = text_ids.setdefault(t, len(text_ids))
            uniq_texts = list(text_ids.keys())
            batch = kernel._ShingleBatch(uniq_texts, k)
            offs = np.zeros(len(uniq_texts) + 1, dtype=np.int64)
            np.cumsum(batch.counts, out=offs[1:])
            h = (
                kernel._window_hashes_seed0(batch)[0].view(np.int64)
                if len(batch.starts)
                else np.empty(0, dtype=np.int64)
            )
            uniq = []
            for d in range(len(uniq_texts)):
                u = np.unique(h[offs[d] : offs[d + 1]])
                if exclude_sorted is not None and len(exclude_sorted) and len(u):
                    u = u[~kernel._in_sorted(u, exclude_sorted)]
                uniq.append(u)
            for i in range(n):
                ua, ub = uniq[idx[i]], uniq[idx[n + i]]
                if len(ua) == 0 and len(ub) == 0:
                    out[i] = 1.0
                    continue
                inter = len(np.intersect1d(ua, ub, assume_unique=True))
                union = len(ua) + len(ub) - inter
                out[i] = inter / union if union else 0.0
        else:
            for i in range(n):
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
