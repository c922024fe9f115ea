"""End-to-end training-corpus curation over a source-code files table.

Composes the engine's operators into the full pipeline a data team runs
before pre-training, with every stage checkpointed + lineage-tracked through
the same TableIO manifests the dedup pipeline uses (resumable; a changed
input, config, or upstream stage invalidates exactly the stale suffix):

    raw files (repo, path, commit, lang, content)
      → filter    (optional license gate + The-Stack path rules
                   [vendored/minified/lockfile] + code-quality rules +
                   StarCoder secret redaction; per-reason drop counts in
                   the manifest)
      → dedup     (the DedupPipeline: MinHash signatures → LSH → exact
                   verify → connected components, SURVEY §2.3)
      → curate    (one representative per near-dup cluster: most characters,
                   then smallest file_id — a deterministic total order)
      → decontaminate (optional: drop files sharing word-5-gram spans with a
                   broadcast eval set — map-side, no big-side shuffle)
      → shards    (optional: hash-balanced training shards)

Every per-row step is a native Column expression; the only Python on the
data path is the signature kernel's Arrow-batched pandas UDF. At 100 TB the
filter stage is a pure map fused into the scan, the dedup stages shuffle on
keys (band_hash, content_sha256, cluster_id) with partial aggregation, and
the eval-span join broadcasts the (small) eval side.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.operators.curation import (
    code_filter_reason,
    redact_secrets,
    secret_counts,
)
from minhash_spark.plans.pipeline import DedupPipeline, StageResult
from minhash_spark.sources.io import TableIO, input_fingerprint


def _doc_spans(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word-n-gram spans per row (whole text when shorter than n
    tokens) — the decontaminate/boilerplate span definition."""
    w = F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9A-Za-z_]+"), F.lit(0))
    spans = F.when(
        F.size(w) < n, F.array(F.array_join(w, " "))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.array_join(F.slice(w, i + 1, n), " "),
            )
        )
    )
    return df.select(F.col(id_col), F.explode(spans).alias("span"))


class CurationPipeline(DedupPipeline):
    """DedupPipeline plus the filter / curate / decontaminate stages (shares
    its checkpoint mechanics: _run_stage, manifests, resume)."""

    T_FILTERED = "filtered"
    T_CURATED = "curated"
    T_DECONTAM = "decontaminated"

    def __init__(
        self,
        spark: SparkSession,
        io: TableIO,
        cfg: MinHashConfig,
        span_n: int = 5,
        min_shared_spans: int = 1,
        license_allow: list[str] | None = None,
        fork_collapse_min_jaccard: float | None = None,
        decontam_mode: str = "broadcast",
    ):
        """``license_allow``: optional The-Stack-style license gate — keep
        only files whose detected license family (operators/curation.py:
        license_columns) is in the list, e.g. ``["mit", "apache", "bsd"]``
        for permissive-only. ``None`` (default) disables the gate. The gate
        runs FIRST in the filter stage (before quality rules), matching the
        public code-corpus pipelines, and participates in filter_hash so
        flipping it invalidates exactly the filtered stage and its suffix."""
        super().__init__(spark, io, cfg)
        self.span_n = span_n
        self.min_shared_spans = min_shared_spans
        # PHYSICAL-ONLY knob (like MinHashConfig.kernel_group): "broadcast"
        # ships the exact eval span set to every executor (right for
        # benchmark-sized sets); "bloom" broadcasts an m-bit bitmap and
        # prefilters train spans map-side before a non-broadcast exact join
        # (the >RAM eval-set path, X70). No false negatives => identical
        # output, so it deliberately does NOT participate in decontam_hash —
        # flipping it must not invalidate checkpoints.
        if decontam_mode not in ("broadcast", "bloom"):
            raise ValueError(f"unknown decontam_mode {decontam_mode!r}")
        self.decontam_mode = decontam_mode
        self.license_allow = sorted(license_allow) if license_allow else None
        # optional repo-level fork collapse (operators/collections.py):
        # dropping a whole forked repo is one row-filter here instead of
        # thousands of file-level near-dup verifications downstream
        self.fork_collapse_min_jaccard = fork_collapse_min_jaccard
        # per-stage identity, so a knob change invalidates exactly the
        # stages it affects: the filter stage keys on the filter-rule
        # definition, the decontamination stage on the span knobs, and the
        # dedup + representative stages on the MinHashConfig hash alone
        from minhash_spark.operators import curation as C

        self.filter_hash = hashlib.sha256(
            json.dumps(
                {
                    "markers": C.AUTOGEN_MARKERS,
                    "thresholds": [C.MAX_LINE_LEN, C.MAX_AVG_LINE_LEN, C.MIN_ALPHA_RATIO],
                    "patterns": C.SECRET_PATTERNS,
                    "order": C.SECRET_REDACT_ORDER,
                    "license_allow": self.license_allow,
                    "license_markers": C.LICENSE_MARKERS,
                    "spdx_pattern": C.SPDX_PATTERN,
                    "path_rules": [
                        C.VENDOR_DIR_MARKERS,
                        C.MINIFIED_SUFFIXES,
                        C.LOCKFILE_NAMES,
                    ],
                    "fork_collapse": self.fork_collapse_min_jaccard,
                },
                sort_keys=True,
            ).encode()
        ).hexdigest()[:16]
        self.decontam_hash = hashlib.sha256(
            json.dumps(
                {"span_n": span_n, "min_shared": min_shared_spans}, sort_keys=True
            ).encode()
        ).hexdigest()[:16]

    def run_curation(
        self, files: DataFrame, eval_files: DataFrame | None = None
    ) -> DataFrame:
        """Full curation; returns the final kept-files table (one row per
        surviving file: repo, path, commit, lang, content [redacted],
        content_sha256, cluster_id)."""
        raw_fp = input_fingerprint(files)

        def build_filtered():
            # precedence: fork collapse (repo-level, cheapest per dropped
            # row), then license gate, then path rules (content-free), then
            # the content-quality rules — first failing rule names the drop
            from minhash_spark.operators.curation import path_filter_reason

            path_reason = path_filter_reason(F.col("path"))
            reason = F.when(
                path_reason != "ok", path_reason
            ).otherwise(code_filter_reason(F.col("content")))
            if self.license_allow is not None:
                from minhash_spark.operators.curation import license_columns

                fam = license_columns(F.col("content"))["license_family"]
                reason = F.when(
                    ~fam.isin(self.license_allow), F.lit("license")
                ).otherwise(reason)
            counts = secret_counts(F.col("content"))
            total = None
            for c in counts.values():
                total = c if total is None else total + c
            src = files
            if self.fork_collapse_min_jaccard is not None:
                from minhash_spark.operators.collections import collapse_forks

                kept_repos = (
                    collapse_forks(files, min_jaccard=self.fork_collapse_min_jaccard)
                    .where(F.col("is_kept"))
                    .select("repo", F.lit(1).alias("_fork_kept"))
                )
                # per-repo verdict table: one short row per repo, orders of
                # magnitude below the file table — plain equi-join on repo
                src = files.join(kept_repos, "repo", "left")
                reason = F.when(F.col("_fork_kept").isNull(), F.lit("fork")).otherwise(
                    reason
                )
            staged = src.withColumn("filter_reason", reason).withColumn(
                "n_secrets", total
            )
            # per-reason drop counts: one tiny agg for the manifest
            drops = {
                r["filter_reason"]: int(r["n"])
                for r in staged.groupBy("filter_reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            redacted = staged.where(F.col("filter_reason") == "ok").select(
                "repo",
                "path",
                "commit",
                "lang",
                redact_secrets(F.col("content")).alias("content"),
                "n_secrets",
            )
            n_in = sum(drops.values())
            metrics = {
                "n_in": n_in,
                "n_kept": drops.get("ok", 0),
                "drops_by_reason": {k: v for k, v in drops.items() if k != "ok"},
            }
            return redacted, metrics

        # the filter_hash guards this stage; swap self.chash temporarily so
        # the inherited _run_stage stamps the right identity. try/finally: a
        # stage failure must not leave the pipeline object carrying the wrong
        # config identity — a caller that catches and retries (or reuses the
        # pipeline) would otherwise stamp/resume stages under a mismatched
        # hash.
        base_hash = self.chash
        self.chash = self.filter_hash
        try:
            filtered = self._run_stage(self.T_FILTERED, [], build_filtered, root=True)
        finally:
            self.chash = base_hash
        self._input_fp = raw_fp  # restore: dedup roots on the raw input too

        filtered_fp = (self.io.manifest(self.T_FILTERED) or {}).get("snapshot_id")

        # dedup over the FILTERED corpus: redaction happens before signatures
        # so redacted twins (same file, different leaked key) dedup exactly
        clusters_all = super().run(
            filtered.drop("n_secrets"), input_fp=filtered_fp
        )

        def build_curated():
            # representative per cluster: most characters, then smallest
            # file_id (argmin-of-struct — partial-aggregable, no window)
            sized = clusters_all.join(
                self.io.read(self.spark, self.T_FILTERED)
                .select("repo", "path", "commit", "content")
                .withColumn("n_chars", F.length("content")),
                ["repo", "path", "commit"],
            )
            key = F.struct(
                (-F.col("n_chars")).alias("neg"), F.col("file_id").alias("fid")
            )
            reps = (
                sized.groupBy("cluster_id")
                .agg(F.min(key).alias("k"), F.count("*").alias("cluster_size"))
                .select(F.col("k.fid").alias("file_id"), "cluster_size")
            )
            out = sized.join(reps, "file_id").select(
                "file_id",
                "repo",
                "path",
                "commit",
                "lang",
                "content",
                "content_sha256",
                "cluster_id",
                F.col("cluster_size").cast("long").alias("cluster_size"),
            )
            return out, {}

        curated = self._run_stage(
            self.T_CURATED, [self.T_CLUSTERS_ALL, self.T_FILTERED], build_curated
        )

        if eval_files is None:
            return curated

        def build_decontam():
            train_spans = _doc_spans(
                curated.select("file_id", "content"), "file_id", "content", self.span_n
            )
            eval_spans = (
                _doc_spans(
                    eval_files.select(F.col("content")).withColumn(
                        "eid", F.monotonically_increasing_id()
                    ),
                    "eid",
                    "content",
                    self.span_n,
                )
                .select("span")
                .distinct()
            )
            if self.decontam_mode == "bloom":
                # X70 path: broadcast a Bloom BITMAP of the eval spans,
                # prefilter train spans map-side, exact-join the survivors
                # WITHOUT broadcasting the eval set (it wouldn't fit at the
                # 10^9-span scale this mode exists for). No false negatives
                # => identical hits to the broadcast path (pytest-pinned).
                import math

                from minhash_spark.operators import bloom
                from minhash_spark.operators.verify import barrier

                ev = barrier(eval_spans)  # feeds count + build + exact join
                ev_h = bloom.with_key_hashes(ev, "span")
                n_keys = ev_h.count()
                m_bits = 1 << max(10, math.ceil(math.log2(max(1, 16 * n_keys))))
                k = min(16, bloom.optimal_k(m_bits, n_keys))
                bitmap = bloom.build_bitmap(ev_h, m_bits, k)
                survivors = bloom.probe_filter(
                    bloom.with_key_hashes(train_spans, "span"),
                    self.spark,
                    bitmap,
                    k,
                    m_bits,
                ).drop("h1", "h2")
                joined = survivors.join(ev, "span")
            else:
                # map-side contamination check: the eval span set is small by
                # construction (benchmarks), so it broadcasts; the train side
                # streams through with NO shuffle of the corpus
                joined = train_spans.join(F.broadcast(eval_spans), "span")
            hits = (
                joined.groupBy("file_id")
                .agg(F.count("*").alias("n_shared"))
                .where(F.col("n_shared") >= self.min_shared_spans)
            )
            n_hits = hits.count()
            out = curated.join(hits.select("file_id"), "file_id", "left_anti")
            return out, {"n_contaminated": int(n_hits)}

        self.chash = self.decontam_hash
        try:
            decontam = self._run_stage(
                self.T_DECONTAM, [self.T_CURATED], build_decontam
            )
        finally:
            self.chash = base_hash
        return decontam
