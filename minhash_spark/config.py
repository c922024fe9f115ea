"""Pipeline configuration (the Spark analogue of the reference's analyzer /
token-filter settings).

The reference reads ``bit``/``size``/``seed`` once per index and precomputes
the hash family (MinHashTokenFilterFactory.java:39-43). We mirror that: one
frozen dataclass, built once on the driver, broadcast implicitly via UDF
closure; its ``config_hash`` gates checkpoint reuse (a config change
invalidates downstream stages, cf. SURVEY §3.3).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class MinHashConfig:
    # signature kernel (reference parameters, MinHashTokenFilterFactory.java:39-41)
    seed: int = 0
    size: int = 128           # number of hash functions / OPH bins
    bit: int = 1              # sampled bits per hash

    # 'kseed' = reference-exact k seeded murmur3 minima (byte-compatible
    # signatures); 'oph' = one-permutation hashing with rotation
    # densification — O(shingles) instead of O(unique x size), the intended
    # kernel at 100 TB (NOT byte-compatible with the reference encoding)
    scheme: str = "kseed"

    # tokenization (reference: any analyzer chain; README.md:42)
    tokenizer: str = "word"   # word | char_shingle | word_shingle
    tokenizer_params: dict = field(default_factory=dict)

    # LSH banding over the full 64-bit minima (SURVEY §2.3 P4)
    num_bands: int = 21
    rows_per_band: int = 6

    # candidate verification
    verify_threshold: float = 0.8     # exact-Jaccard acceptance
    # optional containment acceptance (|A∩B|/min(|A|,|B|) >= this): catches
    # near-containment dups (file embedded in a bigger file) that Jaccard
    # misses — the set-level stand-in for a suffix-array substring check
    containment_threshold: float | None = None
    # when True, containment-accepted pairs must ALSO pass an exact substring
    # check over whitespace-normalized text (north rule's suffix-array
    # substring verification): the set-level containment estimate admits
    # shuffled-shingle false positives that are not real embeddings. The
    # check runs only on pairs that containment would accept and Jaccard
    # alone would not — O(find) on a rare subset, not the hot path.
    substring_verify: bool = False
    sig_prefilter_margin: float = 0.15  # cheap b-bit estimate filter: keep est >= thr - margin

    # skew handling (SURVEY §2.3 P5): buckets larger than this switch from
    # all-pairs to star topology (members pair with the bucket min only),
    # keeping candidate volume linear under boilerplate-shingle skew while
    # preserving cluster connectivity through the representative
    max_bucket_size: int = 64

    # boilerplate-shingle filter (char_shingle only): estimate shingle
    # document frequency on a deterministic sample; shingles present in
    # >= common_df_ratio of sampled docs are excluded from minima, band keys
    # AND verification Jaccard. THE fix for license-header LSH skew.
    filter_common_shingles: bool = False
    common_df_ratio: float = 0.5
    common_sample_docs: int = 100_000
    common_max_shingles: int = 1_000_000

    # null handling (MinHashFieldMapper.java:89-90,260-269)
    null_value: str | None = None

    # physical-only knob: batch window-grouping scheme inside the char-shingle
    # kernel ('murmur' = direct hash of every window, parallel-safe on
    # bandwidth-saturated nodes; 'rolling' = polynomial-key dedup first,
    # 4-10x faster serially / on bandwidth-rich executors when batches dedup
    # heavily — see BENCH/BASELINE.md). Signature bytes are identical either
    # way (pytest-pinned), so it is excluded from config_hash and never
    # invalidates checkpoints. Default flipped to 'rolling' in r6: re-measured
    # at 32-way concurrency on the bench corpus, rolling won every
    # (partitions, batch) combination tried (7.9-8.7 s vs 8.5-11.3 s for the
    # 64k-doc signature pass); env-overridable for bandwidth-starved hosts.
    kernel_group: str = field(
        default_factory=lambda: __import__("os").environ.get(
            "SPARK_GRAFT_KERNEL_GROUP", "rolling"
        )
    )

    _PHYSICAL_ONLY = ("kernel_group",)

    @property
    def sig_width(self) -> int:
        return (self.size * self.bit + 7) // 8

    # Bump when tokenizer/kernel SEMANTICS change (never for pure perf work):
    # folded into config_hash AND signature_hash so checkpoints / streaming
    # state computed under older token rules are invalidated instead of
    # silently resumed as comparable (stale old-vs-new signatures would fail
    # the bit-match prefilter and drop true pairs without a trace).
    # v2: UAX#29 WB4 Extend/Format transparency + Lucene 255-char token
    #     split in the `standard` tokenizer.
    SEMANTICS_VERSION = 2

    def config_hash(self) -> str:
        d = asdict(self)
        for k in self._PHYSICAL_ONLY:
            d.pop(k, None)
        d["_semantics"] = self.SEMANTICS_VERSION
        payload = json.dumps(d, sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    # fields that determine the signature BYTES and band keys — i.e. what a
    # query-time signature must share with the index to be comparable.
    # Verify/skew knobs (verify_threshold, max_bucket_size, ...) deliberately
    # excluded: they shape which PAIRS are accepted, not the stored bytes.
    _SIGNATURE_FIELDS = (
        "seed", "size", "bit", "scheme", "tokenizer", "tokenizer_params",
        "num_bands", "rows_per_band", "null_value",
        "filter_common_shingles", "common_df_ratio", "common_sample_docs",
        "common_max_shingles",
    )

    def signature_hash(self) -> str:
        d = asdict(self)
        payload = {k: d[k] for k in self._SIGNATURE_FIELDS}
        payload["_semantics"] = self.SEMANTICS_VERSION
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    # fields that additionally determine which candidate PAIRS become edges
    # (verification + skew topology) — what a carried-forward edges table
    # must share with this config to be bit-equal to a fresh recompute
    _EDGE_FIELDS = (
        "verify_threshold", "containment_threshold", "substring_verify",
        "sig_prefilter_margin", "max_bucket_size",
    )

    def edge_hash(self) -> str:
        d = asdict(self)
        payload = {k: d[k] for k in self._SIGNATURE_FIELDS + self._EDGE_FIELDS}
        payload["_semantics"] = self.SEMANTICS_VERSION
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    def validate(self) -> "MinHashConfig":
        # fail on the driver at config build, not as a KeyError inside an
        # executor UDF batch
        from minhash_spark.tokenize import CHAR_FILTERS, TOKEN_FILTERS, TOKENIZERS

        if self.tokenizer not in TOKENIZERS:
            raise ValueError(
                f"unknown tokenizer {self.tokenizer!r}; choose from {sorted(TOKENIZERS)}"
            )
        for spec in self.tokenizer_params.get("filters") or ():
            fname = spec if isinstance(spec, str) else spec[0]
            if fname not in TOKEN_FILTERS:
                raise ValueError(
                    f"unknown token filter {fname!r}; choose from {sorted(TOKEN_FILTERS)}"
                )
        for spec in self.tokenizer_params.get("char_filters") or ():
            fname = spec if isinstance(spec, str) else spec[0]
            if fname not in CHAR_FILTERS:
                raise ValueError(
                    f"unknown char filter {fname!r}; choose from {sorted(CHAR_FILTERS)}"
                )
        if self.num_bands * self.rows_per_band > self.size:
            raise ValueError("num_bands*rows_per_band must be <= size")
        if not (1 <= self.bit <= 16):
            raise ValueError("bit must be in 1..16")
        if self.scheme not in ("kseed", "oph"):
            raise ValueError("scheme must be kseed or oph")
        if self.kernel_group not in ("murmur", "rolling"):
            raise ValueError("kernel_group must be murmur or rolling")
        if self.tokenizer == "char_shingle" and self.tokenizer_params.get("filters"):
            # token filters act on word tokens; the char-shingle kernel path
            # never materializes shingle strings, so silently ignoring them
            # would diverge from the string path — reject instead
            raise ValueError(
                "token 'filters' are not supported with tokenizer='char_shingle'; "
                "use 'char_filters' (pre-shingling text transforms)"
            )
        # build the full analyzer chain driver-side: filter KWARGS (e.g. a
        # 'mapping' spec with no mappings, or entries without '=>') must fail
        # at config build, not as an opaque error inside an executor UDF batch
        from minhash_spark.tokenize import make_tokenizer

        make_tokenizer(self.tokenizer, **self.tokenizer_params)
        return self

    def merge(self, other: "MinHashConfig") -> "MinHashConfig":
        """ES mapping-merge analog (O19; MinHashFieldMapper doMerge,
        MinHashFieldMapper.java:297-300): a field's mapping may be UPDATED in
        place only if the update cannot change already-stored bytes. Any
        signature-determining field that differs (analyzer chain, seed,
        size, bit, bands, null_value — `_SIGNATURE_FIELDS`) is a merge
        CONFLICT and raises, listing every conflicting parameter like ES's
        "mapper [field] has different [param]" error. Query-side verify/skew
        knobs (verify_threshold, max_bucket_size, containment settings)
        adopt the incoming values — they shape which pairs are accepted at
        query time, not what was written, so an index/checkpoint stays valid
        across the merge (same reason they are excluded from
        signature_hash)."""
        conflicts = [
            f
            for f in self._SIGNATURE_FIELDS
            if getattr(self, f) != getattr(other, f)
        ]
        if conflicts:
            raise ValueError(
                "mapping merge conflict: different "
                + ", ".join(f"[{f}]" for f in conflicts)
                + " (signature-determining parameters cannot be updated in place; "
                "reindex with a new config instead)"
            )
        return other.validate()


# the three analyzer configs from the reference's golden test
# (MinHashPluginTest.java:79-89)
REFERENCE_CONFIGS = {
    "analyzer1": MinHashConfig(seed=0, size=128, bit=1, tokenizer="word"),
    "analyzer2": MinHashConfig(seed=1000, size=128, bit=1, tokenizer="word"),
    "analyzer3": MinHashConfig(seed=1000, size=32, bit=2, tokenizer="word", num_bands=8, rows_per_band=4),
}


def suggest_bands(size: int, threshold: float, min_recall: float = 0.99) -> tuple[int, int]:
    """LSH band plan (num_bands, rows_per_band) for a Jaccard ``threshold``
    over ``size`` minima: the steepest S-curve whose candidate recall at the
    threshold is still >= ``min_recall``.

    Standard MMDS trade-off: P(candidate | J) = 1 - (1 - J^r)^b. Larger r
    cuts false positives (background pairs J << t collide less) but lowers
    recall at J = t; this picks the largest r whose recall bound holds, so
    the candidate set is as small as the recall target allows. r need not
    divide size — leftover minima simply don't feed bands (they still shape
    the signature)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best: tuple[int, int] | None = None
    for r in range(1, size + 1):
        b = size // r
        if b < 1:
            break
        recall = 1.0 - (1.0 - threshold**r) ** b
        if recall >= min_recall:
            best = (b, r)  # monotone: keep the largest feasible r
        else:
            break
    if best is None:
        raise ValueError(
            f"no (bands, rows) over {size} minima reaches recall {min_recall} at J={threshold}; "
            "increase size or lower min_recall"
        )
    return best
