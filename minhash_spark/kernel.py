"""Pure-NumPy b-bit MinHash kernel — byte-exact with codelibs/elasticsearch-minhash.

This module is Spark-free. It re-implements, from public knowledge (Guava
murmur3_x64_128, the b-bit minwise hashing paper Li & Koenig WWW 2010, and the
reference's public API call sites), the signature computation performed by the
reference plugin's ``minhash`` token filter:

  * ``MinHashTokenFilterFactory.java:39-49`` — k murmur3_128 hash functions
    seeded ``seed .. seed+k-1``, b-bit sampling.
  * ``MinHashFieldMapper.java:271-278`` — base64 / bit-string surface encodings.
  * Golden vectors: ``MinHashPluginTest.java:163-170`` (six base64 strings) —
    all six are reproduced byte-exactly by this kernel (see tests/test_kernel.py).

Semantics (validated, SURVEY.md §2.1):
  1. tokens are hashed over their UTF-16LE code units (Guava
     ``hashUnencodedChars``), NOT UTF-8;
  2. per hash function the doc value is the SIGNED int64 min over tokens of
     the ``h1`` lane (first 8 little-endian bytes) of murmur3_x64_128;
     accumulator starts at Long.MAX_VALUE (empty doc => all minima 2^63-1);
  3. the lowest ``bit`` bits of each minimum, LSB first, in function order,
     are packed with ``java.util.BitSet.toByteArray()`` semantics: bit p of
     the stream lands in byte p//8, bit p%8 (little-endian inside each byte),
     and trailing all-zero BYTES are truncated;
  4. surface encodings: base64 of those bytes, or an MSB-first-per-byte
     "0"/"1" string (``bit_string:true``).

Everything is vectorized: murmur3's block mixing is seed-independent, so a
batch of tokens is pre-mixed once and folded across all k seeds as 2-D uint64
NumPy arithmetic (tokens x seeds). A slow pure-Python oracle is kept for
property tests.
"""

from __future__ import annotations

import base64
import struct

import numpy as np


def _tune_malloc() -> None:
    """This sandbox faults-in fresh mmap pages at ~30 MB/s; glibc munmaps
    >32MB allocations on free, so big NumPy temporaries would re-fault every
    batch. Raising the malloc thresholds keeps the worker heap warm — after
    the first batch, steady-state allocation is ~6 GB/s. Runs in every
    process that imports the kernel (driver AND reused pyspark workers)."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 29)  # M_MMAP_THRESHOLD = 512 MB
        libc.mallopt(-1, (1 << 31) - 1)  # M_TRIM_THRESHOLD: never trim
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_malloc()

LONG_MAX = np.int64(0x7FFFFFFFFFFFFFFF)

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)

# ---------------------------------------------------------------------------
# vectorized murmur3_x64_128 (h1 lane), one token batch x many seeds
# ---------------------------------------------------------------------------


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * _F1
    k = k ^ (k >> np.uint64(33))
    k = k * _F2
    k = k ^ (k >> np.uint64(33))
    return k


def _premix_blocks(tokens: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Encode tokens to UTF-16LE, pad to 16-byte blocks (always >=1 tail block),
    and apply the seed-independent murmur3 block pre-mix.

    Returns (k1p, k2p, nblocks, bytelen):
      k1p/k2p : (n_tokens, max_blocks) uint64 pre-mixed lanes (tail block included
                as the column at index nblocks[i]);
      nblocks : (n_tokens,) int full 16-byte blocks per token (tail excluded);
      bytelen : (n_tokens,) int UTF-16LE byte length.
    """
    encoded = [t.encode("utf-16-le", "surrogatepass") for t in tokens]
    bytelen = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=len(encoded))
    nblocks = bytelen // 16
    # always one extra (possibly all-zero) tail block: XOR-mixing zeros is a no-op,
    # which matches murmur3 skipping the empty tail.
    padded_blocks = int(nblocks.max()) + 1 if len(tokens) else 1
    buf = np.zeros((len(tokens), padded_blocks * 16), dtype=np.uint8)
    for i, e in enumerate(encoded):
        buf[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    lanes = buf.view("<u8")  # (n, 2*padded_blocks): k1,k2 interleaved
    k1 = np.ascontiguousarray(lanes[:, 0::2])
    k2 = np.ascontiguousarray(lanes[:, 1::2])
    with np.errstate(over="ignore"):
        k1p = _rotl(k1 * _C1, 31) * _C2
        k2p = _rotl(k2 * _C2, 33) * _C1
    return k1p, k2p, nblocks, bytelen


def _seed_longs(seed: int, size: int) -> np.ndarray:
    """Java ``(long) intSeed`` sign-extension for seeds seed..seed+size-1."""
    s = (np.int64(seed) + np.arange(size, dtype=np.int64)).astype(np.int32)
    return s.astype(np.int64).view(np.uint64)


def _fold_seeds(
    k1p: np.ndarray, k2p: np.ndarray, nblocks: np.ndarray, bytelen: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """Seed-dependent murmur fold over pre-mixed block lanes.

    k1p/k2p: (n, max_blocks) pre-mixed lanes, tail at column nblocks[i].
    Returns (n, n_seeds) int64 h1 lanes.
    """
    n, k = k1p.shape[0], len(seeds)
    max_nb = int(nblocks.max()) if n else 0
    h1 = np.broadcast_to(seeds, (n, k)).copy()
    h2 = h1.copy()
    with np.errstate(over="ignore"):
        # full blocks (sequential over block index)
        for j in range(max_nb):
            alive = nblocks > j
            if not alive.all():
                a1, a2 = h1[alive], h2[alive]
                a1 = a1 ^ k1p[alive, j][:, None]
                a1 = _rotl(a1, 27) + a2
                a1 = a1 * _M5 + _A1
                a2 = a2 ^ k2p[alive, j][:, None]
                a2 = _rotl(a2, 31) + a1
                a2 = a2 * _M5 + _A2
                h1[alive], h2[alive] = a1, a2
            else:
                h1 ^= k1p[:, j][:, None]
                h1 = _rotl(h1, 27) + h2
                h1 = h1 * _M5 + _A1
                h2 ^= k2p[:, j][:, None]
                h2 = _rotl(h2, 31) + h1
                h2 = h2 * _M5 + _A2
        # tail block (zero-padded; XOR of pre-mixed zeros is a no-op => exact)
        rows = np.arange(n)
        h1 = h1 ^ k1p[rows, nblocks][:, None]
        h2 = h2 ^ k2p[rows, nblocks][:, None]
        # finalization
        ln = bytelen.view(np.uint64)[:, None]
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 = h1 + h2
    return h1.view(np.int64)


def hash_tokens(tokens: list[str], seeds: np.ndarray) -> np.ndarray:
    """murmur3_x64_128 h1 lane of each token under each seed.

    Returns (n_tokens, n_seeds) int64 (signed, as Java ``HashCode.asLong()``).
    """
    if len(tokens) == 0:
        return np.empty((0, len(seeds)), dtype=np.int64)
    k1p, k2p, nblocks, bytelen = _premix_blocks(tokens)
    return _fold_seeds(k1p, k2p, nblocks, bytelen, seeds)


# ---------------------------------------------------------------------------
# per-document minima over (possibly shared) token vocabularies
# ---------------------------------------------------------------------------


def _segment_min(
    uhash: np.ndarray, tok_ids: np.ndarray, counts: np.ndarray, docs_per_chunk: int = 256
) -> np.ndarray:
    """Per-document column-wise min over rows of ``uhash`` selected by
    ``tok_ids`` (concatenated per doc; ``counts[d]`` ids for doc d).

    Adaptive, memory-bound core:
      * SMALL docs (<=64 tokens): bucket by token count, pad to the bucket max
        with the doc's own first token (no-op under min), reduce a dense
        (docs, w, size) cube with SIMD ``min(axis=1)``. When the batch
        vocabulary fits uint16, gather sort-RANKS instead of int64 values
        (4x less traffic), then map the winning ranks back.
      * LARGE docs: per-doc gather + min. Each op touches (count, size) ~ a
        few MB — under the malloc mmap threshold, so the worker heap is
        reused and page faults are paid once per worker, not per batch.

    Returns (n_docs, size) int64; rows with count==0 are LONG_MAX.
    """
    n_docs = len(counts)
    size = uhash.shape[1]
    mins = np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    if len(tok_ids) == 0:
        return mins
    n_uniq = uhash.shape[0]

    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    small = np.flatnonzero((counts > 0) & (counts <= 64))
    large = np.flatnonzero(counts > 64)

    # rank compression when the batch vocabulary fits uint16: gather 2-byte
    # sort-ranks instead of 8-byte values (4x less memory traffic — the
    # gather IS the cost), map winning ranks back at the end. Building the
    # table costs an argsort of (n_uniq x size); only worth it when the
    # gather volume dwarfs it — small-doc cubes always qualify, large docs
    # only on dedup-heavy batches (many window instances per unique)
    use_ranks = n_uniq <= 0xFFFF and (
        len(small) > 0 or len(tok_ids) > 4 * n_uniq
    )
    if use_ranks:
        order = np.argsort(uhash, axis=0, kind="stable")
        sorted_vals = np.take_along_axis(uhash, order, axis=0)
        ranks = np.empty((n_uniq, size), dtype=np.uint16)
        arange = np.arange(n_uniq, dtype=np.uint16)[:, None]
        np.put_along_axis(ranks, order, np.broadcast_to(arange, (n_uniq, size)), axis=0)
        table = ranks
    else:
        table = uhash
    cols = np.arange(size)

    # -- large docs: per-doc gather + min (2-byte rank gather when possible) -
    for d in large:
        ids = tok_ids[offsets[d] : offsets[d + 1]]
        if use_ranks:
            mins[d] = sorted_vals[table[ids].min(axis=0).astype(np.intp), cols]
        else:
            mins[d] = uhash[ids].min(axis=0)

    if len(small) == 0:
        return mins

    # -- small docs: dense padded cube reduced chunk-wise ---------------------
    by_count = small[np.argsort(counts[small], kind="stable")]
    for i in range(0, len(by_count), docs_per_chunk):
        sel = by_count[i : i + docs_per_chunk]
        w = int(counts[sel].max())
        ids = np.empty((len(sel), w), dtype=np.int64)
        for r, d in enumerate(sel):
            c = counts[d]
            ids[r, :c] = tok_ids[offsets[d] : offsets[d] + c]
            ids[r, c:] = ids[r, 0]  # pad with own token: no-op under min
        g = table[ids.ravel()].reshape(len(sel), w, size)
        m = g.min(axis=1)
        if use_ranks:
            mins[sel] = sorted_vals[m.astype(np.intp), cols[None, :]]
        else:
            mins[sel] = m
    return mins


def _factorize_tokens(docs_tokens: list[list[str]]) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Flatten token lists and map to a batch vocabulary.

    Returns (uniq_tokens, tok_ids, counts): ``tok_ids`` concatenated per doc.
    Uses pandas factorize (hash-based, C-speed) when available.
    """
    counts = np.fromiter((len(t) for t in docs_tokens), dtype=np.int64, count=len(docs_tokens))
    flat: list[str] = [t for toks in docs_tokens for t in toks]
    if not flat:
        return [], np.empty(0, dtype=np.int64), counts
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover
        pd = None
    # pandas routes all-str object arrays through its C StringHashTable,
    # which hashes values as NUL-terminated C strings: '' vs '\x00' and
    # 'a\x00b' vs 'a\x00c' collapse to ONE id (found by hypothesis,
    # tests/test_kernel_properties.py). Injectivity is load-bearing — the
    # signature minima and the verify path's set-algebra-over-ids both
    # assume id equality == string equality — so NUL-bearing batches
    # (binary-ish source files) take the exact dict path; the memchr scan
    # deciding the route is negligible next to the murmur fold.
    if pd is not None and not any("\x00" in t for t in flat):
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        return list(uniques), codes.astype(np.int64), counts
    vocab: dict[str, int] = {}
    codes = np.empty(len(flat), dtype=np.int64)
    for i, t in enumerate(flat):
        codes[i] = vocab.setdefault(t, len(vocab))
    return list(vocab.keys()), codes, counts


def minhash_mins(
    docs_tokens: list[list[str]],
    seed: int = 0,
    size: int = 128,
    token_chunk: int = 1 << 12,
) -> np.ndarray:
    """(n_docs, size) int64 signed minima; Long.MAX_VALUE rows for empty docs.

    Tokens are deduplicated across the whole batch (min is idempotent), hashed
    once, then segment-min'd per doc — the shared-vocabulary win dominates on
    text/code corpora.
    """
    n_docs = len(docs_tokens)
    uniq, tok_ids, counts = _factorize_tokens(docs_tokens)
    if not uniq:
        return np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    seeds = _seed_longs(seed, size)
    if len(uniq) > _UNIQ_FOLD_CHUNK:
        # vocabulary-explosion guard (e.g. unique-id-dense machine logs):
        # bound the dense fold to chunk x size, merge chunk minima
        def fold(lo: int, hi: int) -> np.ndarray:
            out = np.empty((hi - lo, size), dtype=np.int64)
            for s in range(lo, hi, token_chunk):
                e = min(s + token_chunk, hi)
                out[s - lo : e - lo] = hash_tokens(uniq[s:e], seeds)
            return out

        return _chunked_fold_min(fold, len(uniq), tok_ids, counts, n_docs, size)
    uhash = np.empty((len(uniq), size), dtype=np.int64)
    for lo in range(0, len(uniq), token_chunk):
        uhash[lo : lo + token_chunk] = hash_tokens(uniq[lo : lo + token_chunk], seeds)
    return _segment_min(uhash, tok_ids, counts)


class _ShingleBatch:
    """Whitespace-normalized texts packed into ONE contiguous uint16 buffer of
    UTF-16LE code units, with per-doc offsets. Shingles of a doc are the
    sliding windows of k units; they are never materialized — hashes are
    computed from shifted slices of the buffer.

    Docs shorter than k units yield exactly one zero-padded-to-k window
    (matching ``tokenize.char_shingles``: whole normalized text, one shingle);
    to keep slice arithmetic uniform the buffer pads every doc's end with k
    zero units, and only valid window starts are enumerated in ``starts``.
    """

    __slots__ = ("buf", "starts", "counts", "short_len", "k", "_buf64")

    def __init__(self, texts: list[str], k: int):
        import re

        ws = re.compile(r"\s+")
        self.k = k
        n_docs = len(texts)
        encoded: list[bytes] = []
        self.counts = np.zeros(n_docs, dtype=np.int64)
        self.short_len = np.zeros(n_docs, dtype=np.int64)  # >0 marks short docs
        unit_off = 0
        offsets = np.zeros(n_docs, dtype=np.int64)
        for i, t in enumerate(texts):
            norm = ws.sub(" ", t.strip())
            b = norm.encode("utf-16-le")
            encoded.append(b)
            offsets[i] = unit_off
            units = len(b) // 2
            unit_off += units + k  # k zero-pad units after every doc
            if units == 0:
                continue
            if units <= k:
                self.counts[i] = 1
                self.short_len[i] = units * 2
            else:
                self.counts[i] = units - k + 1
        self._buf64 = None
        self.buf = np.zeros(unit_off + 8, dtype="<u2")
        for i, b in enumerate(encoded):
            if b:
                self.buf[offsets[i] : offsets[i] + len(b) // 2] = np.frombuffer(b, dtype="<u2")
        starts = np.empty(int(self.counts.sum()), dtype=np.int64)
        pos = 0
        for i in range(n_docs):
            c = int(self.counts[i])
            if c:
                starts[pos : pos + c] = offsets[i] + np.arange(c)
                pos += c
        self.starts = starts

    def buf_u64(self) -> np.ndarray:
        if self._buf64 is None:
            self._buf64 = self.buf.astype(np.uint64)
        return self._buf64

    def bytelens(self) -> np.ndarray:
        """Per-window murmur input byte length (2k, or 2*units for short docs)."""
        out = np.full(len(self.starts), 2 * self.k, dtype=np.int64)
        if (self.short_len > 0).any():
            doc_of = np.repeat(np.arange(len(self.counts)), self.counts)
            sl = self.short_len[doc_of]
            out = np.where(sl > 0, sl, out)
        return out

    def window_string(self, start: int, bytelen: int) -> str:
        units = bytelen // 2
        raw = self.buf[start : start + units].tobytes()
        return raw.decode("utf-16-le", "surrogatepass")


def _window_hashes_seed0(
    batch: _ShingleBatch, chunk: int = 1 << 16
) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 (seed 0) h1+h2 lanes for every window of the batch,
    computed from shifted slices of the contiguous buffer (no gather).

    Zero-padding beyond a doc's content is correct: murmur input is the
    window's bytes zero-extended to full 16-byte blocks, and the XOR block
    fold treats padded-zero lanes as no-ops; short docs get their true byte
    length in the finalization, so results equal hashing the decoded string.
    """
    k = batch.k
    n = len(batch.starts)
    h1o = np.empty(n, dtype=np.uint64)
    h2o = np.empty(n, dtype=np.uint64)
    bytelen_all = batch.bytelens()
    nblocks = (2 * k) // 16  # full blocks for a k-unit window
    buf64 = batch.buf_u64()
    for lo in range(0, n, chunk):
        s = batch.starts[lo : lo + chunk]
        blen = bytelen_all[lo : lo + chunk]
        with np.errstate(over="ignore"):
            h1 = np.zeros(len(s), dtype=np.uint64)
            h2 = np.zeros(len(s), dtype=np.uint64)

            # uint64 lane from up to 4 consecutive uint16 units at window
            # offset u. Units at or past k belong to the NEXT window (doc
            # content, not padding) and are masked out — murmur treats the
            # window as its bytes zero-extended to full 16-byte blocks, and
            # short docs' buffers are genuinely zero there, so masking at k
            # reproduces exact per-window hashing for both cases.
            def lane(u: int) -> np.ndarray:
                acc = np.zeros(len(s), dtype=np.uint64)
                for c in range(4):
                    if u + c < k:
                        acc |= buf64[s + u + c] << np.uint64(16 * c)
                return acc

            # per-window full-block count: windows shorter than 16*(j+1) bytes
            # must treat block j as TAIL (XOR only, no block mix) — murmur3
            # block-mixes only complete 16-byte blocks. Only short docs
            # (units < 8) ever diverge from the uniform path.
            wb = blen // 16
            for j in range(nblocks):
                k1 = _rotl(lane(8 * j) * _C1, 31) * _C2
                k2 = _rotl(lane(8 * j + 4) * _C2, 33) * _C1
                full = wb > j
                if full.all():
                    h1 ^= k1
                    h1 = _rotl(h1, 27) + h2
                    h1 = h1 * _M5 + _A1
                    h2 ^= k2
                    h2 = _rotl(h2, 31) + h1
                    h2 = h2 * _M5 + _A2
                else:
                    # tail rows: XOR only (zero lanes past the window's bytes
                    # make this a no-op for windows already fully consumed)
                    x1 = h1 ^ k1
                    x2 = h2 ^ k2
                    f1 = _rotl(x1, 27) + h2
                    f1 = f1 * _M5 + _A1
                    f2 = _rotl(x2, 31) + f1
                    f2 = f2 * _M5 + _A2
                    h1 = np.where(full, f1, x1)
                    h2 = np.where(full, f2, x2)
            # tail block (zero-padded to 16 bytes; no-op if empty)
            if 8 * nblocks < k:
                h1 ^= _rotl(lane(8 * nblocks) * _C1, 31) * _C2
            if 8 * nblocks + 4 < k:
                h2 ^= _rotl(lane(8 * nblocks + 4) * _C2, 33) * _C1
            ln = blen.astype(np.uint64)
            h1 ^= ln
            h2 ^= ln
            h1 = h1 + h2
            h2 = h2 + h1
            h1 = _fmix64(h1)
            h2 = _fmix64(h2)
            o1 = h1 + h2
            o2 = h2 + o1
        h1o[lo : lo + chunk] = o1
        h2o[lo : lo + chunk] = o2
    return h1o, h2o


# ---------------------------------------------------------------------------
# batch window dedup via rolling keys (cheap grouping; murmur stays the
# public shingle identity and is computed only on distinct windows)
# ---------------------------------------------------------------------------

_RB1 = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_RB2 = np.uint64(0xDA942042E4DD58B5)  # odd, independent base
_RB1_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_RB2_INV = np.uint64(pow(0xDA942042E4DD58B5, -1, 1 << 64))
_RLEN_MIX = np.uint64(0x165667B19E3779F9)


def _pow_array(base: np.uint64, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod 2^64. NumPy's u64 cumprod is a ~50x-slower
    scalar scan, so build it as outer(base^(qK), base^r) with python-int
    scalar power chains (K=2048: ~n/K + K scalar muls, then one SIMD outer)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    K = 1 << 11
    m = (1 << 64) - 1
    b = int(base)
    ns = min(n, K)
    small = np.empty(ns, dtype=np.uint64)
    cur = 1
    for i in range(ns):
        small[i] = cur
        cur = (cur * b) & m
    nq = (n + K - 1) // K
    bigstep = pow(b, K, 1 << 64)
    big = np.empty(nq, dtype=np.uint64)
    cur = 1
    for q in range(nq):
        big[q] = cur
        cur = (cur * bigstep) & m
    with np.errstate(over="ignore"):
        return np.multiply.outer(big, small).ravel()[:n]


def _roll_base(
    u: np.ndarray, starts: np.ndarray, ends: np.ndarray, base: np.uint64, base_inv: np.uint64
) -> np.ndarray:
    """Polynomial window hash H(s,e) = sum_{j=s}^{e-1} u[j]*base^(e-1-j)
    (mod 2^64) for every window, from two prefix passes over the buffer."""
    n = len(u)
    with np.errstate(over="ignore"):
        powinv = _pow_array(base_inv, n)
        powb = _pow_array(base, n)
        pref = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(u * powinv, out=pref[1:])
        return (pref[ends] - pref[starts]) * powb[ends - 1]


def _window_roll_keys(batch: _ShingleBatch) -> tuple[np.ndarray, np.ndarray]:
    """128-bit rolling dedup keys (two independent bases, length-mixed) for
    every window. NOT a shingle identity — only groups byte-identical
    windows so the murmur passes run once per DISTINCT window (boilerplate-
    heavy corpora dedup 10-100x per batch). Random collision odds ~n^2/2^128;
    the string path stays the exactness oracle in tests."""
    u = batch.buf_u64()  # shared with the murmur premix's cached cast
    lens = (batch.bytelens() // 2).astype(np.uint64)
    starts = batch.starts
    ends = starts + lens.astype(np.int64)
    with np.errstate(over="ignore"):
        r1 = _fmix64(_roll_base(u, starts, ends, _RB1, _RB1_INV) ^ lens * _RLEN_MIX)
        r2 = _fmix64(_roll_base(u, starts, ends, _RB2, _RB2_INV) ^ lens * _RLEN_MIX)
    return r1, r2


def _window_dedup(batch: _ShingleBatch) -> tuple[np.ndarray, np.ndarray]:
    """Group byte-identical windows: returns (tok_ids, rep_rows) where
    ``rep_rows`` indexes one representative window per distinct key and
    ``tok_ids[w]`` maps window w to its representative's position in
    ``rep_rows``. Single-key stable sort on r1 with r2 as a tie-splitter:
    interleaved r1-collisions may split a true group (extra murmur work,
    never a wrong merge — merging needs both 64-bit keys equal adjacently)."""
    r1, r2 = _window_roll_keys(batch)
    order = np.argsort(r1, kind="stable")
    r1s, r2s = r1[order], r2[order]
    new = np.empty(len(order), dtype=bool)
    new[0] = True
    new[1:] = (r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])
    tok_ids = np.empty(len(order), dtype=np.int64)
    tok_ids[order] = np.cumsum(new) - 1
    return tok_ids, order[new]


def _rep_seed_hash(
    batch: _ShingleBatch,
    rep_rows: np.ndarray,
    seeds: np.ndarray,
    token_chunk: int = 1 << 12,
) -> np.ndarray:
    """murmur3_x64_128 h1 lane per (representative window, seed) — the exact
    per-window premix+fold path, applied to distinct windows only."""
    starts = batch.starts[rep_rows]
    blens = batch.bytelens()[rep_rows]
    n = len(rep_rows)
    out = np.empty((n, len(seeds)), dtype=np.int64)
    for lo in range(0, n, token_chunk):
        hi = min(lo + token_chunk, n)
        k1p, k2p, nb, bl = _premix_windows_u16(batch, starts[lo:hi], blens[lo:hi])
        out[lo:hi] = _fold_seeds(k1p, k2p, nb, bl, seeds)
    return out


def _group_windows_murmur(
    batch: _ShingleBatch,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group byte-identical windows by their 128-bit murmur seed-0 digest
    (compute-dense, cache-friendly: overlapping windows re-read hot buffer
    lines). Returns (tok_ids, rep_rows, h1rep) — h1 per representative comes
    free, so exclusion needs no extra hash pass."""
    h1, h2 = _window_hashes_seed0(batch)
    order = np.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    new = np.empty(len(order), dtype=bool)
    new[0] = True
    new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    tok_ids = np.empty(len(order), dtype=np.int64)
    tok_ids[order] = np.cumsum(new) - 1
    rep_rows = order[new]
    return tok_ids, rep_rows, h1.view(np.int64)[rep_rows]


def window_h1_seed0(batch: _ShingleBatch, group: str = "murmur") -> np.ndarray:
    """Per-window murmur h1 (seed 0), the public shingle identity.

    ``group='murmur'`` (default) hashes every window directly — the
    parallel-safe path on bandwidth-saturated nodes (this sandbox's DRAM
    serializes ~6-8 cores; measured at 16-way concurrency the direct pass
    beats rolling-key dedup despite doing more arithmetic).
    ``group='rolling'`` dedups windows with cheap polynomial keys first and
    murmurs only distinct windows — 4-10x faster single-threaded or on
    bandwidth-rich executors when batches dedup heavily."""
    if len(batch.starts) == 0:
        return np.empty(0, dtype=np.int64)
    if group == "rolling":
        tok_ids, rep_rows = _window_dedup(batch)
        h1rep = _rep_seed_hash(batch, rep_rows, _seed_longs(0, 1))[:, 0]
        return h1rep[tok_ids]
    return _window_hashes_seed0(batch)[0].view(np.int64)


def minhash_mins_char_shingle(
    texts: list[str],
    k: int = 9,
    seed: int = 0,
    size: int = 128,
    token_chunk: int = 1 << 12,
    exclude_sorted: np.ndarray | None = None,
    group: str = "murmur",
) -> np.ndarray:
    """Fast path for char-shingle MinHash: shingles are sliding windows of k
    UTF-16 code units over whitespace-normalized text, never materialized as
    Python strings. Windows are grouped batch-wide so the 128-seed fold runs
    once per DISTINCT shingle; repeated (doc, shingle) pairs collapse before
    the min-reduce. Semantics match ``tokenize.char_shingles`` for BMP text
    (code units == code points); the string path remains the exactness
    oracle (collision odds ~n^2/2^129 for murmur grouping, ~n^2/2^128 for
    rolling keys).

    ``group``: window-grouping scheme — see ``window_h1_seed0``. 'murmur'
    (default) is parallel-safe on bandwidth-saturated nodes; 'rolling' is
    4-10x faster single-threaded on dedup-heavy corpora. Output values are
    identical either way (pytest-pinned).

    ``exclude_sorted``: optional SORTED int64 array of boilerplate shingle
    hashes (h1 lane, seed 0) to drop before minima — the document-frequency
    skew filter (shared license headers would otherwise correlate band
    minima across unrelated files).
    """
    n_docs = len(texts)
    batch = _ShingleBatch(texts, k)
    if len(batch.starts) == 0:
        return np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    if group == "rolling":
        tok_ids, rep_rows = _window_dedup(batch)
        h1rep = None
    else:
        tok_ids, rep_rows, h1rep = _group_windows_murmur(batch)
    counts = batch.counts
    if exclude_sorted is not None and len(exclude_sorted):
        # exclusion identity is murmur h1 seed 0 (what common_shingles
        # publishes); murmur grouping yields it for free. Excluded windows
        # are dropped BEFORE the per-seed fold — boilerplate-heavy batches
        # (the filter's whole target) would otherwise pay the full
        # (excluded x size) fold only to overwrite the rows. A doc whose
        # every window is excluded ends with count 0 -> all-LONG_MAX row
        # (empty-stream semantics, identical to the min over no rows).
        if h1rep is None:
            h1rep = _rep_seed_hash(batch, rep_rows, _seed_longs(0, 1), token_chunk)[:, 0]
        drop = _in_sorted(h1rep, exclude_sorted)
        if drop.any():
            keep = ~drop
            pair_keep = keep[tok_ids]
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            remap = np.cumsum(keep, dtype=np.int64) - 1
            tok_ids = remap[tok_ids[pair_keep]]
            counts = np.bincount(doc_of[pair_keep], minlength=n_docs)
            rep_rows = rep_rows[keep]
            if len(rep_rows) == 0:
                return np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    seeds = _seed_longs(seed, size)
    if len(rep_rows) > _UNIQ_FOLD_CHUNK:
        # low-dedup batch (diverse content): the dense (n_uniq x size) fold
        # output would be unbounded — 8M distinct windows x 128 seeds x 8 B
        # is ~8 GB per worker. Fold distinct-window CHUNKS with a running
        # per-doc min-reduce instead; memory stays O(chunk x size) while the
        # batch-wide window dedup is preserved.
        return _chunked_fold_min(
            lambda lo, hi: _rep_seed_hash(batch, rep_rows[lo:hi], seeds, token_chunk),
            len(rep_rows),
            tok_ids,
            counts,
            n_docs,
            size,
        )
    uhash = _rep_seed_hash(batch, rep_rows, seeds, token_chunk)
    n_uniq = uhash.shape[0]
    if n_uniq * 4 < len(tok_ids):
        # dedup-heavy batch: collapse repeated (doc, shingle) pairs before the
        # min-reduce — one flat sort replaces a 4x+ larger rank gather
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        key = np.sort(doc_of * np.int64(n_uniq) + tok_ids)
        new = np.empty(len(key), dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        sel = key[new]
        doc2 = sel // n_uniq
        tok_ids = sel - doc2 * n_uniq
        counts = np.bincount(doc2, minlength=n_docs)
    return _segment_min(uhash, tok_ids, counts)


# bound on the per-seed fold's dense working set: chunk x size x 8 B
# (134 MB at size=128) regardless of how little a batch dedups. Above
# 0xFFFF so the common (dedup-heavy) path never pays the chunked loop.
_UNIQ_FOLD_CHUNK = 1 << 17


def _chunked_fold_min(
    fold,
    n_uniq: int,
    tok_ids: np.ndarray,
    counts: np.ndarray,
    n_docs: int,
    size: int,
) -> np.ndarray:
    """Per-doc minima without materializing the full (n_uniq x size) fold:
    distinct tokens/windows are processed in chunks via ``fold(lo, hi) ->
    (hi-lo, size) int64``, each chunk's per-doc segment minima merged into a
    running (n_docs x size) accumulator (min is associative, so chunked
    minima equal the global minima exactly)."""
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.argsort(tok_ids, kind="stable")
    st = tok_ids[order]
    sd = doc_of[order]
    mins = np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    for lo in range(0, n_uniq, _UNIQ_FOLD_CHUNK):
        hi = min(lo + _UNIQ_FOLD_CHUNK, n_uniq)
        a = int(np.searchsorted(st, lo, "left"))
        b = int(np.searchsorted(st, hi, "left"))
        if a == b:
            continue
        width = np.int64(hi - lo)
        # collapse repeated (doc, token) pairs, then group per doc: one
        # flat sort gives _segment_min its doc-contiguous id layout
        key = np.sort(sd[a:b] * width + (st[a:b] - lo))
        new = np.empty(len(key), dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        sel = key[new]
        d2 = sel // width
        t2 = sel - d2 * width
        cnt2 = np.bincount(d2, minlength=n_docs)
        np.minimum(mins, _segment_min(fold(lo, hi), t2, cnt2), out=mins)
    return mins


def _premix_windows_u16(
    batch: _ShingleBatch, starts: np.ndarray, bytelens: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Seed-independent murmur block premix for windows addressed directly in
    the batch buffer (no Python-string materialization).

    Lane components at or past the shingle width k are masked (neighboring
    doc content); short docs' buffers are zero beyond their content, so for
    them the same mask yields exact zero-extension. A short window has
    nblocks = bytelen//16 (its lanes double as the tail block at column 0).
    """
    k = batch.k
    n = len(starts)
    nb_full = (2 * k) // 16
    buf64 = batch.buf_u64()
    k1p = np.zeros((n, nb_full + 1), dtype=np.uint64)
    k2p = np.zeros((n, nb_full + 1), dtype=np.uint64)

    def lane(u: int) -> np.ndarray:
        acc = np.zeros(n, dtype=np.uint64)
        for c in range(4):
            if u + c < k:
                acc |= buf64[starts + u + c] << np.uint64(16 * c)
        return acc

    with np.errstate(over="ignore"):
        for j in range(nb_full + 1):
            l1 = lane(8 * j)
            l2 = lane(8 * j + 4)
            k1p[:, j] = _rotl(l1 * _C1, 31) * _C2
            k2p[:, j] = _rotl(l2 * _C2, 33) * _C1
    nblocks = (bytelens // 16).astype(np.int64)
    return k1p, k2p, nblocks, bytelens.astype(np.int64)


def _in_sorted(vals: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of vals in a sorted array (vectorized searchsorted)."""
    idx = np.searchsorted(sorted_arr, vals)
    idx = np.clip(idx, 0, len(sorted_arr) - 1)
    return sorted_arr[idx] == vals


# ---------------------------------------------------------------------------
# one-permutation hashing (OPH) — the 100 TB scale scheme
# ---------------------------------------------------------------------------


def _oph_from_pairs(
    hvals: np.ndarray, doc_ids: np.ndarray, n_docs: int, size: int, seed: int
) -> np.ndarray:
    """One-permutation MinHash from (doc_id, token_hash) pairs.

    Each token is hashed ONCE; its high bits pick one of ``size`` bins and the
    per-(doc, bin) min is kept (Li/Owen/Zhang NIPS 2012). Empty bins are
    filled by circular rotation densification (Shrivastava & Li ICML 2014),
    offset-mixed so borrowed values differ across bins. ~size-times cheaper
    than the k-seed scheme with equivalent LSH behavior; NOT byte-compatible
    with the reference encoding (use scheme='kseed' for that).

    Returns (n_docs, size) int64; empty docs stay LONG_MAX.
    """
    mins = np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    if len(hvals) == 0:
        return mins
    with np.errstate(over="ignore"):
        u = hvals.view(np.uint64)
        if seed:
            u = _fmix64(u ^ np.uint64(np.int64(seed)))
        # high bits -> bin (uniform); remaining entropy -> value
        bins = ((u >> np.uint64(32)) * np.uint64(size)) >> np.uint64(32)
        vals = _fmix64(u).view(np.int64)
    key = doc_ids * np.int64(size) + bins.astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks, vs = key[order], vals[order]
    bnd = np.flatnonzero(np.diff(ks, prepend=np.int64(-1)))
    seg_min = np.minimum.reduceat(vs, bnd)
    flat = mins.reshape(-1)
    flat[ks[bnd]] = seg_min
    # rotation densification: forward-fill empty bins circularly (per doc)
    filled = mins != LONG_MAX
    any_filled = filled.any(axis=1)
    dbl = np.concatenate([mins, mins], axis=1)
    fdbl = np.concatenate([filled, filled], axis=1)
    idx = np.where(fdbl, np.arange(2 * size), -1)
    np.maximum.accumulate(idx, axis=1, out=idx)
    take = idx[:, size:]  # for bin j: last filled bin at or before j+size in doubled view
    rowr = np.arange(n_docs)[:, None]
    borrowed = dbl[rowr, np.maximum(take, 0)]
    offset = (np.arange(size)[None, :] + size - take) % (2 * size)
    with np.errstate(over="ignore"):
        mixed = _fmix64(borrowed.view(np.uint64) ^ (np.uint64(0xA24BAED4963EE407) * (offset.astype(np.uint64) + np.uint64(1)))).view(np.int64)
    out = np.where(filled, mins, mixed)
    out[~any_filled] = LONG_MAX
    return out


def oph_mins(docs_tokens: list[list[str]], size: int = 128, seed: int = 0) -> np.ndarray:
    """OPH minima over string token lists (batch-deduped, one hash each)."""
    uniq, tok_ids, counts = _factorize_tokens(docs_tokens)
    n_docs = len(docs_tokens)
    if not uniq:
        return np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    seeds0 = _seed_longs(0, 1)
    h = np.empty(len(uniq), dtype=np.int64)
    for lo in range(0, len(uniq), 1 << 14):
        h[lo : lo + (1 << 14)] = hash_tokens(uniq[lo : lo + (1 << 14)], seeds0)[:, 0]
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    return _oph_from_pairs(h[tok_ids], doc_ids, n_docs, size, seed)


def oph_mins_char_shingle(
    texts: list[str],
    k: int = 9,
    size: int = 128,
    seed: int = 0,
    exclude_sorted: np.ndarray | None = None,
    group: str = "direct",
) -> np.ndarray:
    """OPH fast path for char shingles: windows hashed once (h1 lane, seed 0),
    minima via one (doc, bin) segmented pass — cost is O(total_shingles), not
    O(unique_shingles x size). This is the intended kernel at 100 TB.

    ``group='rolling'`` dedups windows first and murmurs only distinct ones
    (2-3x faster single-threaded on dedup-heavy corpora; the direct default
    scales better under saturated memory bandwidth — same tradeoff as
    ``window_h1_seed0``). Values identical either way."""
    n_docs = len(texts)
    batch = _ShingleBatch(texts, k)
    if len(batch.starts) == 0:
        return np.full((n_docs, size), LONG_MAX, dtype=np.int64)
    if group == "rolling":
        tok_ids, rep_rows = _window_dedup(batch)
        h1rep = _rep_seed_hash(batch, rep_rows, _seed_longs(0, 1))[:, 0]
        h1 = h1rep[tok_ids]
        if exclude_sorted is not None and len(exclude_sorted):
            keep = ~_in_sorted(h1rep, exclude_sorted)[tok_ids]
        else:
            keep = None
    else:
        h1 = _window_hashes_seed0(batch)[0].view(np.int64)
        keep = (
            ~_in_sorted(h1, exclude_sorted)
            if exclude_sorted is not None and len(exclude_sorted)
            else None
        )
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), batch.counts)
    if keep is not None:
        h1, doc_ids = h1[keep], doc_ids[keep]
    return _oph_from_pairs(h1, doc_ids, n_docs, size, seed)


# ---------------------------------------------------------------------------
# b-bit packing + surface encodings (compat boundary with the reference)
# ---------------------------------------------------------------------------


def pack_bbit(mins: np.ndarray, bit: int = 1) -> np.ndarray:
    """Pack the lowest ``bit`` bits of each minimum, LSB first, in function
    order, little-endian inside each byte (java.util.BitSet layout).

    Returns (n_docs, ceil(size*bit/8)) uint8 — FIXED width (internal form;
    the reference's trailing-zero truncation is applied only by the base64 /
    bit-string compat encoders below).
    """
    u = mins.view(np.uint64)
    shifts = np.arange(bit, dtype=np.uint64)
    bits = ((u[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(mins.shape[0], mins.shape[1] * bit)
    return np.packbits(flat, axis=1, bitorder="little")


def strip_trailing_zeros(sig: bytes) -> bytes:
    """java.util.BitSet.toByteArray() truncates trailing all-zero bytes."""
    end = len(sig)
    while end > 0 and sig[end - 1] == 0:
        end -= 1
    return sig[:end]


def to_base64(sig: bytes) -> str:
    """Reference surface encoding (MinHashFieldMapper.java:276-277)."""
    return base64.b64encode(strip_trailing_zeros(sig)).decode("ascii")


def to_bit_string(sig: bytes) -> str:
    """Reference ``bit_string:true`` encoding (MinHashFieldMapper.java:273-274):
    MSB-first binary per byte of the (truncated) signature bytes."""
    return "".join(format(b, "08b") for b in strip_trailing_zeros(sig))


def compare(sig_a: bytes, sig_b: bytes) -> float:
    """Fraction of equal bits (MinHash.compare library surface, SURVEY §2.1.6).

    Estimates ``J + (1-J)/2`` for b-bit signatures of Jaccard-J token sets,
    for ANY bit width: matching minima (prob J) agree on all their sampled
    bits, differing minima agree per bit with prob 1/2 (low bits of
    independent 64-bit minima are uniform). Note this per-BIT statistic
    differs from the b-bit paper's per-BLOCK collision rate J + (1-J)/2^b —
    the reference's MinHash.compare is also per-bit (popcount of XOR).
    Inputs must be the FIXED-width packed form (equal length).
    """
    a = np.frombuffer(sig_a, dtype=np.uint8)
    b = np.frombuffer(sig_b, dtype=np.uint8)
    if len(a) != len(b):
        raise ValueError("signature width mismatch")
    if len(a) == 0:
        return 1.0
    diff = np.unpackbits(a ^ b).sum()
    return 1.0 - float(diff) / (8 * len(a))


def estimate_jaccard(bit_match: float, bit: int) -> float:
    """Invert E[per-bit match] = J + (1-J)/2  =>  J = 2p - 1 (clamped).

    Independent of ``bit``: compare() measures PER-BIT equality, whose
    baseline for differing minima is 1/2 at every bit width (the 2^-b figure
    is the per-BLOCK collision rate — a different statistic). The ``bit``
    parameter is kept for API stability."""
    del bit
    return max(0.0, min(1.0, 2.0 * bit_match - 1.0))


# ---------------------------------------------------------------------------
# LSH band keys over the full 64-bit minima (scale path; SURVEY §2.3 P4)
# ---------------------------------------------------------------------------


def band_keys(mins: np.ndarray, num_bands: int, rows_per_band: int, band_seed: int = 0x9E3779B9) -> np.ndarray:
    """Hash consecutive groups of ``rows_per_band`` minima into one int64 key
    per band. Banding over the FULL 64-bit minima (not the b-bit signature)
    keeps the random-pair collision probability ~2^-64 per band, which is what
    makes LSH viable at 10^12 rows (b-bit bands would collide at rate 2^-b*r).

    The band index is folded into the key, so a single int64 key identifies
    (band, band-value) and buckets from different bands never merge.

    Returns (n_docs, num_bands) int64.
    """
    n, k = mins.shape
    need = num_bands * rows_per_band
    if need > k:
        raise ValueError(f"num_bands*rows_per_band={need} exceeds size={k}")
    u = mins.view(np.uint64)[:, :need].reshape(n, num_bands, rows_per_band)
    with np.errstate(over="ignore"):
        acc = _fmix64(np.uint64(band_seed) ^ (np.arange(num_bands, dtype=np.uint64) * _C1))
        acc = np.broadcast_to(acc, (n, num_bands)).copy()
        for r in range(rows_per_band):
            acc = _fmix64(acc ^ u[:, :, r])
    return acc.view(np.int64)


# ---------------------------------------------------------------------------
# SimHash (engine extension; 64-bit charikar simhash over token multiset)
# ---------------------------------------------------------------------------


def simhash64(docs_tokens: list[list[str]]) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit sums of token hashes (+1/-1),
    token multiplicity counted. Returns (n_docs,) int64.

    Fully batched: tokens are factorized across the WHOLE batch, each unique
    token hashed once, and per-doc bit votes accumulated as 64 segmented
    bincounts — no per-doc Python, no large temporaries.
    """
    n_docs = len(docs_tokens)
    out = np.zeros(n_docs, dtype=np.int64)
    uniq, tok_ids, counts = _factorize_tokens(docs_tokens)
    if not uniq:
        return out
    seeds0 = _seed_longs(0, 1)
    h = np.empty(len(uniq), dtype=np.int64)
    for lo in range(0, len(uniq), 1 << 14):
        h[lo : lo + (1 << 14)] = hash_tokens(uniq[lo : lo + (1 << 14)], seeds0)[:, 0]
    hu = h.view(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    # per-bit vote = 2*(# set occurrences) - (# occurrences): one bincount per
    # bit over small float temporaries (a dense (tokens x 64) contribution
    # slab would page-fault this sandbox's slow-mmap allocator to death)
    bitsf = (((hu[:, None] >> shifts) & np.uint64(1))).astype(np.float64)
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    cnt = counts.astype(np.float64)
    sig = np.zeros(n_docs, dtype=np.uint64)
    for b in range(64):
        ones = np.bincount(doc_ids, weights=bitsf[tok_ids, b], minlength=n_docs)
        sig |= ((2.0 * ones - cnt) > 0).astype(np.uint64) << np.uint64(b)
    nonempty = counts > 0
    out[nonempty] = sig.view(np.int64)[nonempty]
    return out


# ---------------------------------------------------------------------------
# pure-Python oracle (slow; property tests assert vectorized == oracle)
# ---------------------------------------------------------------------------

_PMASK = (1 << 64) - 1
_PC1 = 0x87C37B91114253D5
_PC2 = 0x4CF5AD432745937F


def _protl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _PMASK


def _pfmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _PMASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _PMASK
    k ^= k >> 33
    return k


def murmur3_x64_128_h1(data: bytes, seed: int) -> int:
    """Pure-Python Guava-compatible murmur3_x64_128, h1 lane as SIGNED int64."""
    seed &= 0xFFFFFFFF
    if seed & 0x80000000:
        seed |= 0xFFFFFFFF00000000
    h1 = h2 = seed
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _PC1) & _PMASK
        k1 = _protl(k1, 31)
        k1 = (k1 * _PC2) & _PMASK
        h1 ^= k1
        h1 = _protl(h1, 27)
        h1 = (h1 + h2) & _PMASK
        h1 = (h1 * 5 + 0x52DCE729) & _PMASK
        k2 = (k2 * _PC2) & _PMASK
        k2 = _protl(k2, 33)
        k2 = (k2 * _PC1) & _PMASK
        h2 ^= k2
        h2 = _protl(h2, 31)
        h2 = (h2 + h1) & _PMASK
        h2 = (h2 * 5 + 0x38495AB5) & _PMASK
    tail = data[nblocks * 16 :]
    if tail:
        t = tail + b"\x00" * (16 - len(tail))
        k1, k2 = struct.unpack("<QQ", t)
        k1 = (k1 * _PC1) & _PMASK
        k1 = _protl(k1, 31)
        k1 = (k1 * _PC2) & _PMASK
        h1 ^= k1
        k2 = (k2 * _PC2) & _PMASK
        k2 = _protl(k2, 33)
        k2 = (k2 * _PC1) & _PMASK
        h2 ^= k2
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _PMASK
    h2 = (h2 + h1) & _PMASK
    h1 = _pfmix(h1)
    h2 = _pfmix(h2)
    h1 = (h1 + h2) & _PMASK
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


def minhash_signature_oracle(tokens: list[str], seed: int, size: int, bit: int) -> bytes:
    """Slow reference implementation: FIXED-width packed signature bytes."""
    mins = [(1 << 63) - 1] * size
    for t in tokens:
        data = t.encode("utf-16-le")
        for i in range(size):
            h = murmur3_x64_128_h1(data, seed + i)
            if h < mins[i]:
                mins[i] = h
    nbits = size * bit
    out = bytearray((nbits + 7) // 8)
    p = 0
    for m in mins:
        for b in range(bit):
            if (m >> b) & 1:
                out[p // 8] |= 1 << (p % 8)
            p += 1
    return bytes(out)
