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


# cap the kernel working set per sub-batch (guards pathological inputs like
# a handful of 100 MB files landing in one Arrow batch).
#
# Sizing: windows scale ~1:1 with chars, and the char-shingle kernel's peak
# temporaries are a few 8-byte arrays over windows (~300-500 MB/worker at
# 8M chars — heap-reused across batches under the raised malloc thresholds).
# Too SMALL a cap is far worse than too large: slicing a 1024-doc Arrow
# batch into 96 KB kernel calls cut batch-wide window dedup from ~110x to
# ~11x and re-paid per-call fixed costs, measuring 17.7 s vs 3.8 s for the
# same 1024 docs (the whole-batch call also lets the 128-seed fold run once
# per GLOBAL unique window). 8M chars ≈ one full Arrow batch of 5 KB docs.
_MAX_CHARS_PER_KERNEL_CALL = 8_000_000


def _slices_by_chars(str_list: list[str], max_chars: int):
    lo, acc = 0, 0
    for i, s in enumerate(str_list):
        acc += len(s)
        if acc >= max_chars and i + 1 > lo:
            yield lo, i + 1
            lo, acc = i + 1, 0
    if lo < len(str_list):
        yield lo, len(str_list)


def _apply_char_filters(str_list: list[str], cfg: MinHashConfig) -> list[str]:
    """Pre-tokenization char-filter chain for the char-shingle KERNEL path.

    The string path applies char filters inside make_tokenizer's analyze();
    the kernel fast path never materializes shingle strings, so the filters
    must run on the raw text before _ShingleBatch — otherwise a configured
    ``html_strip``/``mapping`` would be silently ignored while still being
    folded into config_hash."""
    specs = cfg.tokenizer_params.get("char_filters")
    if not specs:
        return str_list
    from minhash_spark.tokenize import CHAR_FILTERS

    chain = []
    for spec in specs:
        if isinstance(spec, str):
            fname, kw = spec, {}
        else:
            fname, kw = spec[0], dict(spec[1])
        chain.append(CHAR_FILTERS[fname](**kw))
    out = str_list
    for cf in chain:
        out = [cf(t) for t in out]
    return out


def _compute_mins(
    texts: pd.Series, cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    vals = texts.fillna(cfg.null_value) if cfg.null_value is not None else texts
    mask = vals.notna().to_numpy()
    str_list = vals.fillna("").astype(str).tolist()
    out = np.empty((len(str_list), cfg.size), dtype=np.int64)
    oph = cfg.scheme == "oph"
    if cfg.tokenizer == "char_shingle":
        str_list = _apply_char_filters(str_list, cfg)
        k = cfg.tokenizer_params.get("k", 9)
        grp = getattr(cfg, "kernel_group", "murmur")
        for lo, hi in _slices_by_chars(str_list, _MAX_CHARS_PER_KERNEL_CALL):
            if oph:
                # OPH hashes each window ONCE — rolling-key grouping cannot
                # amortize a multi-seed fold there, and its key passes cost
                # more than the single murmur they'd save (r6 measurement:
                # same effect on the other 1-hash paths below); the
                # kernel_group knob therefore scopes to the kseed fold only
                out[lo:hi] = kernel.oph_mins_char_shingle(
                    str_list[lo:hi], k=k, size=cfg.size, seed=cfg.seed,
                    exclude_sorted=exclude_sorted,
                    group="direct",
                )
            else:
                out[lo:hi] = kernel.minhash_mins_char_shingle(
                    str_list[lo:hi], k=k, seed=cfg.seed, size=cfg.size,
                    exclude_sorted=exclude_sorted, group=grp,
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


def _multi_config_mins(str_list: list[str], cfgs: list[MinHashConfig]) -> np.ndarray:
    """(n_docs, sum(size)) minima for the one-pass copy_to fan-out: tokenize +
    factorize ONCE, fold every config's seed family over the same token
    vocabulary. Vocabularies above _UNIQ_FOLD_CHUNK route through the chunked
    min-reduce (bounded dense working set, identical minima)."""
    from minhash_spark.tokenize import make_tokenizer as _mk

    cfg0 = cfgs[0]
    tok = _mk(cfg0.tokenizer, **cfg0.tokenizer_params)
    docs_tokens = [tok(s) for s in str_list]
    uniq, tok_ids, counts = kernel._factorize_tokens(docs_tokens)
    all_seeds = np.concatenate([kernel._seed_longs(c.seed, c.size) for c in cfgs])
    if not uniq:
        return np.full((len(str_list), len(all_seeds)), kernel.LONG_MAX, dtype=np.int64)
    if len(uniq) > kernel._UNIQ_FOLD_CHUNK:
        # vocabulary-explosion guard, same as minhash_mins: bound the dense
        # (uniq x total_seeds) fold, merge chunk minima
        def fold(lo: int, hi: int) -> np.ndarray:
            out = np.empty((hi - lo, len(all_seeds)), dtype=np.int64)
            for s in range(lo, hi, 1 << 12):
                e = min(s + (1 << 12), hi)
                out[s - lo : e - lo] = kernel.hash_tokens(uniq[s:e], all_seeds)
            return out

        return kernel._chunked_fold_min(
            fold, len(uniq), tok_ids, counts, len(str_list), len(all_seeds)
        )
    uhash = np.empty((len(uniq), len(all_seeds)), dtype=np.int64)
    for lo in range(0, len(uniq), 1 << 12):
        uhash[lo : lo + (1 << 12)] = kernel.hash_tokens(uniq[lo : lo + (1 << 12)], all_seeds)
    return kernel._segment_min(uhash, tok_ids, counts)


def multi_config_struct_udf(configs: dict[str, MinHashConfig]):
    """content -> struct<name: struct<sig, sig_b64, bands>, ...> — the one-pass
    ``copy_to`` fan-out (MinHashPluginTest.java:106-113 indexes one field into
    three minhash fields with different analyzers).

    All configs must share a tokenizer: the text is tokenized + factorized
    ONCE and every config's seed family is folded over the same pre-mixed
    murmur blocks in a single (tokens x total_seeds) pass — N configs cost
    one tokenize plus one wide hash fold, not N full passes.
    """
    names = list(configs)
    cfgs = [configs[n].validate() for n in names]
    tok_key = {(c.tokenizer, tuple(sorted(c.tokenizer_params.items()))) for c in cfgs}
    if len(tok_key) != 1:
        raise ValueError("multi_config_struct_udf requires a shared tokenizer")
    if any(c.scheme != "kseed" for c in cfgs):
        raise ValueError("copy_to fan-out is a reference-compat surface: kseed only")
    if cfgs[0].tokenizer == "char_shingle":
        raise ValueError("use per-config char_shingle UDFs (buffered fast path)")
    out_type = T.StructType(
        [T.StructField(n, SIG_STRUCT_TYPE) for n in names]
    )
    col_offs = np.cumsum([0] + [c.size for c in cfgs])

    @pandas_udf(out_type)
    def _udf(texts: pd.Series) -> pd.DataFrame:
        cfg0 = cfgs[0]
        vals = texts.fillna(cfg0.null_value) if cfg0.null_value is not None else texts
        mask = vals.notna().to_numpy()
        str_list = vals.fillna("").astype(str).tolist()
        mins_all = _multi_config_mins(str_list, cfgs)
        cols = {}
        for j, (n, c) in enumerate(zip(names, cfgs)):
            mins = mins_all[:, col_offs[j] : col_offs[j + 1]]
            packed = kernel.pack_bbit(mins, bit=c.bit)
            bands = kernel.band_keys(mins, c.num_bands, c.rows_per_band)
            cols[n] = [
                {
                    "sig": packed[i].tobytes(),
                    "sig_b64": kernel.to_base64(packed[i].tobytes()),
                    "bands": bands[i],
                }
                if mask[i]
                else None
                for i in range(len(str_list))
            ]
        return pd.DataFrame(cols)

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


def minhash_mins_udf(cfg: MinHashConfig):
    """content -> array<long> of the raw 64-bit minima (NOT b-bit packed).

    The raw minima are the mergeable form of the signature: MinHash is a
    monoid under elementwise min (min over A ∪ B = elementwise min of the
    per-set minima), so collection-level signatures (repo = union of its
    files' token sets) are a plain aggregation over this column. The b-bit
    packed signature is NOT mergeable — packing keeps only the low bits of
    each minimum, and min ordering is not recoverable from them — so
    collection rollups must happen at this layer, before ``pack_bbit``.
    Null content (after null_value coalescing) yields a null array.

    Only the ``kseed`` scheme is mergeable as-is; OPH's empty-bucket rotation
    fill-in runs AFTER the minima, so OPH signatures must be merged from the
    pre-rotation bucket minima (not offered here — validate() rejects it).
    """
    cfg.validate()
    if cfg.scheme == "oph":
        raise ValueError(
            "minhash_mins_udf: OPH minima are rotation-filled and not "
            "mergeable post-fill; use scheme='kseed' for collection rollups"
        )

    @pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        mins, mask = _compute_mins(texts, cfg)
        return pd.Series(
            [mins[i] if mask[i] else None for i in range(len(texts))]
        )

    return _udf


def bands_from_mins_udf(cfg: MinHashConfig):
    """array<long> minima -> array<long> LSH band keys (kernel.band_keys).

    Used after a collection-level elementwise-min merge: the merged minima
    re-enter the SAME banding as per-document signatures, so one LSH/topology
    stack (operators/lsh.py) serves documents and collections alike."""
    cfg.validate()

    @pandas_udf(T.ArrayType(T.LongType()))
    def _udf(mins: pd.Series) -> pd.Series:
        out = []
        vals = mins.tolist()
        ok = [i for i, v in enumerate(vals) if v is not None]
        if ok:
            arr = np.asarray([vals[i] for i in ok], dtype=np.int64)
            bands = kernel.band_keys(arr, cfg.num_bands, cfg.rows_per_band)
        res: list = [None] * len(vals)
        for j, i in enumerate(ok):
            res[i] = bands[j]
        return pd.Series(res)

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
    Used by the document-frequency pass of the boilerplate-shingle filter.

    Always the direct murmur pass: this is a SINGLE-hash-per-window path, so
    rolling-key grouping has no multi-seed fold to amortize and measured
    slower (r6: 2.5 s direct vs 3.3 s rolling on the bench DF pass)."""
    k = cfg.tokenizer_params.get("k", 9)
    grp = "murmur"

    @pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        str_list = _apply_char_filters(texts.fillna("").astype(str).tolist(), cfg)
        batch = kernel._ShingleBatch(str_list, k)
        n = len(str_list)
        if len(batch.starts) == 0:
            return pd.Series([[] for _ in range(n)])
        h = kernel.window_h1_seed0(batch, group=grp)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(batch.counts, out=offs[1:])
        return pd.Series([np.unique(h[offs[d] : offs[d + 1]]) for d in range(n)])

    return _udf


def window_doc_freq_frames(cfg: MinHashConfig):
    """mapInPandas body: content batches -> pre-aggregated (h, df) frames,
    where df counts DOCS containing shingle-hash h within the batch.

    Semantically identical to ``explode(distinct_window_hashes_udf(content))
    -> groupBy(h).count()`` but the per-batch aggregation happens in one
    vectorized np.unique instead of shipping every (doc, distinct-hash) row
    through Arrow into a JVM explode + hash aggregate — on the bench sample
    that is ~126M exploded rows (~1 GB of Arrow traffic) collapsed to the
    per-batch distinct set before anything crosses the boundary. The
    downstream groupBy(h).sum(df) completes the exact same document
    frequency."""
    from minhash_spark import kernel

    k = cfg.tokenizer_params.get("k", 9)

    def fn(batches):
        for pdf in batches:
            str_list = _apply_char_filters(
                pdf["content"].fillna("").astype(str).tolist(), cfg
            )
            batch = kernel._ShingleBatch(str_list, k)
            n = len(str_list)
            if len(batch.starts) == 0:
                continue
            h = kernel.window_h1_seed0(batch, group="murmur")
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(batch.counts, out=offs[1:])
            per_doc = [np.unique(h[offs[d] : offs[d + 1]]) for d in range(n)]
            hs = np.concatenate([u for u in per_doc if len(u)]) if per_doc else None
            if hs is None or len(hs) == 0:
                continue
            u, c = np.unique(hs, return_counts=True)
            yield pd.DataFrame({"h": u, "df": c.astype(np.int64)})

    return fn


SIMILARITY_TYPE = T.StructType(
    [
        T.StructField("jaccard", T.DoubleType()),
        T.StructField("containment", T.DoubleType()),
        T.StructField("substr", T.BooleanType()),
    ]
)


def _unique_id_sets(
    a: pd.Series, b: pd.Series, cfg: MinHashConfig, exclude_sorted: np.ndarray | None
) -> tuple[list[np.ndarray], np.ndarray]:
    """Map every DISTINCT text across both columns to a sorted int64 array of
    its distinct token ids (shared by jaccard_udf / similarity_udf).

    Candidate pairs repeat the same docs many times (a cluster of m members
    contributes C(m,2) pairs), so each distinct text is tokenized/hashed
    exactly once per batch. char_shingle path: windows of the whole batch
    hashed in one vectorized murmur pass (h1 lane; collision odds ~n^2/2^65,
    negligible). word paths: tokens factorized to int ids across the batch
    (pandas hash table, C-speed) — set algebra over ids equals set algebra
    over strings because factorize is injective. Per-pair work is sorted-array
    intersection in NumPy; no per-row Python string sets anywhere.

    Returns (uniq_sets, idx): pair i compares uniq_sets[idx[i]] (from a) with
    uniq_sets[idx[n+i]] (from b).
    """
    n = len(a)
    texts = a.fillna("").astype(str).tolist() + b.fillna("").astype(str).tolist()
    text_ids: dict[str, int] = {}
    idx = np.empty(2 * n, dtype=np.int64)
    for i, t in enumerate(texts):
        idx[i] = text_ids.setdefault(t, len(text_ids))
    uniq_texts = list(text_ids.keys())
    uniq: list[np.ndarray] = []
    if cfg.tokenizer == "char_shingle":
        k = cfg.tokenizer_params.get("k", 9)
        batch = kernel._ShingleBatch(_apply_char_filters(uniq_texts, cfg), k)
        offs = np.zeros(len(uniq_texts) + 1, dtype=np.int64)
        np.cumsum(batch.counts, out=offs[1:])
        # single-hash path: direct murmur regardless of cfg.kernel_group
        # (the knob scopes to the multi-seed kseed fold — see
        # distinct_window_hashes_udf)
        h = (
            kernel.window_h1_seed0(batch, group="murmur")
            if len(batch.starts)
            else np.empty(0, dtype=np.int64)
        )
        for d in range(len(uniq_texts)):
            u = np.unique(h[offs[d] : offs[d + 1]])
            if exclude_sorted is not None and len(exclude_sorted) and len(u):
                u = u[~kernel._in_sorted(u, exclude_sorted)]
            uniq.append(u)
    else:
        tok = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)
        docs_tokens = [tok(t) for t in uniq_texts]
        _, tok_ids, counts = kernel._factorize_tokens(docs_tokens)
        offs = np.zeros(len(uniq_texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        for d in range(len(uniq_texts)):
            uniq.append(np.unique(tok_ids[offs[d] : offs[d + 1]]))
    return uniq, idx


def _pair_overlap_scores(
    uniq: list[np.ndarray], idx: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pair (jaccard, containment) over sorted unique-id arrays."""
    jac = np.zeros(n)
    cont = np.zeros(n)
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
    return jac, cont


def score_similarity_frame(
    a: pd.Series, b: pd.Series, cfg: MinHashConfig, exclude_sorted: np.ndarray | None
) -> pd.DataFrame:
    """(content_a, content_b) series -> DataFrame(jaccard, containment,
    substr). The batch body shared by ``similarity_udf`` (column form) and
    the verify stage's cogroup scorer (operators/verify.py) — ONE
    implementation of the exact-verify semantics, so the two call shapes
    cannot drift."""
    import re as _re

    do_substr = cfg.substring_verify and cfg.containment_threshold is not None
    n = len(a)
    uniq, idx = _unique_id_sets(a, b, cfg, exclude_sorted)
    jac, cont = _pair_overlap_scores(uniq, idx, n)
    substr = np.full(n, None, dtype=object)
    if do_substr:
        ws = _re.compile(r"\s+")
        need = np.flatnonzero((cont >= cfg.containment_threshold) & (jac < cfg.verify_threshold))
        for i in need:
            sa = ws.sub(" ", ("" if a.iat[i] is None else str(a.iat[i])).strip())
            sb = ws.sub(" ", ("" if b.iat[i] is None else str(b.iat[i])).strip())
            small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
            substr[i] = small in big
    return pd.DataFrame({"jaccard": jac, "containment": cont, "substr": substr})


def similarity_udf(cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None):
    """(content_a, content_b) -> struct(jaccard, containment).

    containment = |A∩B| / min(|A|,|B|) over the same shingle sets — the cheap
    set-level FILTER for embedded-file detection (SURVEY §2.3 P6): a file
    embedded verbatim in a larger one has containment ~1 even when Jaccard
    is low. When ``cfg.substring_verify`` is set, pairs that only
    containment would accept are then verified with an exact substring check
    on whitespace-normalized text (the north rule's suffix-array substring
    semantics; str.find is the right tool per-pair — a suffix automaton only
    pays off when one side is matched against MANY others). ``substr`` is
    null for pairs where the check was not needed.
    """
    cfg.validate()

    @pandas_udf(SIMILARITY_TYPE)
    def _udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        return score_similarity_frame(a, b, cfg, exclude_sorted)

    return _udf


def jaccard_udf(cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None):
    """(content_a, content_b) -> exact token-set Jaccard (verification stage).

    Token sets are built with the SAME tokenizer config as the signatures, so
    the verified threshold is in signature space. All tokenizer paths share
    the batched distinct-text machinery (_unique_id_sets): each distinct text
    hashed/factorized once, per-pair sorted-array intersections — no per-row
    Python string sets in the hot path.
    """
    cfg.validate()

    @pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        uniq, idx = _unique_id_sets(a, b, cfg, exclude_sorted)
        jac, _ = _pair_overlap_scores(uniq, idx, len(a))
        return pd.Series(jac)

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


def signature_for_text(
    text: str, cfg: MinHashConfig, exclude_sorted: np.ndarray | None = None
) -> tuple[bytes, list[int]]:
    """Driver-side signature of ONE text under ``cfg``: (fixed-width b-bit
    signature bytes, LSH band keys). Same kernel path as the Arrow UDFs —
    a query-time signature is byte-identical to the indexed one, which is
    what makes signature search / exact term-lookup possible (the
    reference's query flow: analyze the query text with the same analyzer,
    then match against the indexed minhash keyword)."""
    mins, mask = _compute_mins(pd.Series([text]), cfg, exclude_sorted)
    if not mask[0]:
        raise ValueError("null query text")
    packed = kernel.pack_bbit(mins, bit=cfg.bit)
    bands = kernel.band_keys(mins, cfg.num_bands, cfg.rows_per_band)
    return packed[0].tobytes(), [int(b) for b in bands[0]]
