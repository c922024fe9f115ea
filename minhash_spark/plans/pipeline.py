"""The end-to-end dedup pipeline (north rule): files -> signatures -> buckets
-> candidate pairs -> verified edges -> clusters, checkpointed + resumable.

Stage graph (each node a checkpoint table with a lineage manifest):

    files ──> [common_shingles] ──> signatures ──> edges ──> clusters ──> clusters_all
              (sampled DF filter)       (buckets + candidates + verify inline)

Resume: a stage whose manifest matches (config_hash + upstream snapshot ids)
is skipped (SURVEY §2.3 P8). Per-row invariant: content_sha256 flows from the
input scan into clusters_all untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

from minhash_spark.config import MinHashConfig
from minhash_spark.operators import components, lsh, signatures, verify
from minhash_spark.sources.io import TableIO, input_fingerprint

# Above this many input files the signatures stage falls back from the
# broadcast-attach rep join (content never shuffled; build side is the
# (content_sha256, file_id) metadata aggregate, ~130 B/file -> ~500 MB at
# the default cap) to the content-shuffling distinct_contents groupBy.
# Parameterized for cluster submitters; the default keeps the broadcast
# well under Spark's 8 GB relation cap with room for executor copies.
REP_BROADCAST_MAX_FILES = int(
    os.environ.get("SPARK_GRAFT_REP_BROADCAST_MAX", 4_000_000)
)


@dataclass
class StageResult:
    name: str
    skipped: bool
    rows: int


class DedupPipeline:
    """Batch near-duplicate detection + clustering over a files table."""

    T_SIG = "signatures"
    T_EDGES = "edges"
    T_CLUSTERS = "clusters"
    T_CLUSTERS_ALL = "clusters_all"

    def __init__(
        self,
        spark: SparkSession,
        io: TableIO,
        cfg: MinHashConfig,
        cc_driver_threshold: int | None = None,
        assume_unique_rows: bool = True,
    ):
        self.spark = spark
        self.io = io
        self.cfg = cfg.validate()
        self.chash = cfg.config_hash()
        self.stages: list[StageResult] = []
        self._input_fp: str | None = None  # set per run() from the files df
        # the zero-content-shuffle broadcast-rep signatures path keeps every
        # scan row whose file_id is a representative, so it requires the
        # files table to be unique by its natural key (repo, path, commit) —
        # duplicate rows would yield duplicate signature rows where the
        # shuffle path's groupBy collapses them. That uniqueness is the
        # files-table contract everywhere in this engine, and validating it
        # costs a corpus metadata aggregate per run (~1 s at bench scale,
        # measured), so it is asserted by CONTRACT, not by job: callers that
        # cannot guarantee uniqueness pass assume_unique_rows=False to force
        # the duplicate-collapsing content-shuffle path.
        self.assume_unique_rows = assume_unique_rows
        # edge-count at/below which connected components solve on the driver
        # (None = components.connected_components' default). Settable so a
        # cluster submitter can force the distributed large/small-star path
        # (cc_driver_threshold=0) or raise the driver cutoff; the planted
        # E2E test runs both paths and asserts identical clusters.
        self.cc_driver_threshold = cc_driver_threshold

    # -- stages ---------------------------------------------------------
    def _run_stage(
        self, name: str, upstream: list[str], build, root: bool = False, **write_kw
    ) -> DataFrame:
        # root stages carry the input dataset fingerprint in their manifest;
        # downstream stages inherit identity through upstream snapshot ids
        fp = self._input_fp if root else None
        if self.io.is_fresh(name, self.chash, upstream, input_fp=fp):
            m = self.io.manifest(name)
            self.stages.append(StageResult(name, True, m["rows"]))
            return self.io.read(self.spark, name)
        df, metrics = build()
        m = self.io.write(
            df, name, self.chash, upstream, extra_metrics=metrics, input_fp=fp, **write_kw
        )
        self.stages.append(StageResult(name, False, m["rows"]))
        return self.io.read(self.spark, name)

    T_COMMON = "common_shingles"

    def _hot_shingles(self, files: DataFrame, n: int):
        """Deterministic-sample shingle document frequencies -> sorted int64
        array of boilerplate hashes (cfg.filter_common_shingles)."""
        import numpy as np

        from minhash_spark.functions.udfs import window_doc_freq_frames

        cfg = self.cfg

        def build_common():
            d = max(1, n // cfg.common_sample_docs)
            sample = files.where(F.pmod(F.abs(F.hash("content")), F.lit(d)) == 0)
            n_sample = sample.count()
            thr = max(2, int(cfg.common_df_ratio * n_sample))
            # per-batch pre-aggregated (h, df) frames from the UDF, summed to
            # exact document frequencies — identical result to the r5
            # explode+count, minus ~1 GB of Arrow rows (guide §2.3 aggregate
            # before you shuffle, applied at the Python boundary too)
            dfreq = (
                sample.select("content")
                .mapInPandas(window_doc_freq_frames(cfg), "h long, df long")
                .groupBy("h")
                .agg(F.sum("df").alias("df"))
                .where(F.col("df") >= thr)
                .orderBy(F.col("df").desc())
                .limit(cfg.common_max_shingles)
            )
            return dfreq, {"sample_docs": n_sample, "df_threshold": thr}

        hot_df = self._run_stage(self.T_COMMON, [], build_common, root=True)
        hot = np.sort(np.array([r["h"] for r in hot_df.collect()], dtype=np.int64))
        return hot

    def run(
        self,
        files: DataFrame,
        input_fp: str | None = None,
        prev_signatures: DataFrame | None = None,
        prev_signature_hash: str | None = None,
        prev_edges: DataFrame | None = None,
        prev_edge_hash: str | None = None,
    ) -> DataFrame:
        cfg = self.cfg
        if prev_signatures is not None and prev_signature_hash is not None:
            # carry-forward is bit-exact ONLY if the previous snapshot's
            # signatures were computed under an identical kernel+banding
            # config; enforce at the API boundary (not just the dedup CLI)
            # so programmatic callers cannot silently mix configs
            if prev_signature_hash != cfg.signature_hash():
                raise ValueError(
                    "prev_signatures were computed under a different signature "
                    f"config ({prev_signature_hash} != {cfg.signature_hash()}); "
                    "carry-forward would not be bit-exact"
                )
        if prev_edges is not None:
            # edge carry-forward additionally needs the previous snapshot's
            # rep_id -> content_sha256 map (to re-key day-1 edges into this
            # snapshot's rep ids) and identical verify/skew knobs. The hash
            # is REQUIRED here — this API is new, so there is no lenient
            # legacy caller to protect.
            if prev_signatures is None:
                raise ValueError(
                    "prev_edges requires prev_signatures (the previous "
                    "snapshot's rep_id -> content_sha256 map)"
                )
            if prev_edge_hash != cfg.edge_hash():
                raise ValueError(
                    "prev_edges were computed under a different edge config "
                    f"({prev_edge_hash} != {cfg.edge_hash()}); carried edges "
                    "would not match a fresh recompute"
                )
        self._input_fp = input_fp if input_fp is not None else input_fingerprint(files)
        # one count, shared by the common-shingle sampler and the signature
        # stage's broadcast-vs-shuffle decision (no per-stage re-count)
        n_files = files.count()
        exclude = None
        if cfg.filter_common_shingles and cfg.tokenizer == "char_shingle":
            exclude = self._hot_shingles(files, n_files)
        if prev_signatures is not None and exclude is not None:
            # the sampled boilerplate exclude list is corpus-dependent, so a
            # signature carried from the previous snapshot would NOT equal a
            # fresh recompute under this snapshot's exclude list — refuse
            # rather than silently break the carry-forward == recompute pin
            raise ValueError(
                "prev_signatures is incompatible with filter_common_shingles"
            )

        def build_signatures():
            with_id = signatures.with_identity(files)
            if n_files <= REP_BROADCAST_MAX_FILES and self.assume_unique_rows:
                # ZERO content shuffles: the rep decision is made on the
                # (content_sha256, file_id) metadata aggregate and broadcast
                # back onto the scan, so the kernel runs fused into the scan
                # tasks and content never crosses an exchange (guide §8 —
                # decide with small rows, move big rows never). Costs one
                # extra scan+sha pass inside the broadcast build; measured
                # ~12% faster than the content-shuffle groupBy at bench
                # scale and strictly better at cluster scale (a scan is
                # network-free where a shuffle is not). Output bit-identical
                # (A/B exceptAll == 0; planted pytest unchanged).
                reps = signatures.representatives_by_id(
                    with_id, signatures.rep_id_set(with_id)
                )
                # on this path the kernel UDF runs FUSED into the scan, so
                # its parallelism is the scan's split width. session.py's
                # 4 MB maxPartitionBytes guarantees a wide scan for the
                # bench corpus, but DedupPipeline must not depend on who
                # built the session: if the input arrives badly under-split
                # (default 128 MB splits, or a few huge unsplittable files
                # on a big cluster — guide §2.5), pay ONE round-robin
                # content exchange to feed the CPU-bound kernel rather than
                # run it on a handful of tasks. The probe plans no job, and
                # "within 2x of defaultParallelism" keeps this an identity
                # on any reasonably-split input (bench: 64 scan partitions
                # vs parallelism 64 — no exchange added).
                spread = (
                    files.rdd.getNumPartitions() * 2
                    < self.spark.sparkContext.defaultParallelism
                )
            else:
                # huge corpora: the metadata aggregate no longer broadcasts;
                # one content shuffle under the dedup groupBy, pre-spread
                # for the kernel (guide §2.4 — share one exchange between
                # co-keyed operations)
                par = self.spark.sparkContext.defaultParallelism
                reps = signatures.distinct_contents(with_id, num_partitions=par)
                spread = False  # distinct_contents pre-partitioned wide
            metrics: dict = {
                "excluded_shingles": 0 if exclude is None else int(len(exclude)),
                # signature-relevant config identity (kernel + banding only):
                # what a query-time signature must match to be comparable —
                # jobs/search.py gates on this, not the full config hash
                "signature_hash": cfg.signature_hash(),
            }
            if prev_signatures is None:
                sigs = signatures.compute_signatures(
                    reps, cfg, exclude_sorted=exclude, spread=spread
                )
                return sigs, metrics
            # snapshot carry-forward (north rule's daily-crawl shape): a
            # MinHash signature is a pure function of (content, signature
            # config), so signatures from the previous snapshot's checkpoint
            # are EXACT for unchanged content — the kernel (the pipeline's
            # dominant cost) runs only on the content delta. rep_id is
            # always recomputed from THIS snapshot's file ids, so cluster
            # labels and CC nodes never reference retired files; only the
            # expensive byte columns (sig, sig_b64, bands) carry over.
            # Output is bit-identical to a full recompute
            # (tests/test_history.py pins the operator-level equivalent;
            # test_pipeline_snapshot.py pins this stage end-to-end), so the
            # stage's manifest identity (config hash + input fingerprint)
            # remains truthful.
            prev = prev_signatures.select("content_sha256", "sig", "sig_b64", "bands")
            # barrier: the miss set feeds a count (delta observability in the
            # manifest) AND the kernel pass — materialize the anti-join once
            miss = verify.barrier(
                reps.join(prev.select("content_sha256"), "content_sha256", "left_anti")
            )
            hit = reps.select("content_sha256", "rep_id").join(prev, "content_sha256")
            fresh = signatures.compute_signatures(miss, cfg, exclude_sorted=exclude)
            sigs = hit.select(*fresh.columns).unionByName(fresh)
            metrics["computed_fresh_contents"] = int(miss.count())
            return sigs, metrics

        sigs = self._run_stage(
            self.T_SIG,
            [self.T_COMMON] if exclude is not None else [],
            build_signatures,
            root=True,
        )

        def build_edges():
            # bucket explode is a trivial projection of the signatures
            # checkpoint — computed inline, not persisted (a checkpoint would
            # add a write+read of |sigs| x num_bands rows with no resume value)
            buckets = lsh.explode_buckets(sigs)
            # candidate_pairs materializes the post-filter overflow rows
            # itself (r6: the stats aggregation runs once inside that
            # barrier build; only the few overflow survivors are ever
            # checkpointed — the r6-wave-1 full-width bucket_stats barrier
            # materialized |buckets| stats rows for the same information)
            pairs, overflow = lsh.candidate_pairs(buckets, cfg.max_bucket_size)
            # 1-row aggregate, not collect(): overflow can be wide under
            # pathological skew and must never land row-by-row on the driver
            over = overflow.agg(
                F.count("*").alias("n"), F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("m")
            ).first()
            metrics = {
                "overflow_buckets": int(over["n"]),
                "overflow_members": int(over["m"]),
                "max_bucket_size_cap": cfg.max_bucket_size,
                # carried-edge comparability identity (verify/skew knobs on
                # top of the signature identity) — what a NEXT snapshot's
                # --prev-checkpoints run gates its edge carry-forward on
                "edge_hash": cfg.edge_hash(),
            }
            contents = signatures.with_identity(files).select(
                F.col("file_id").alias("rep_id"), "content"
            )
            edges = verify.verify_pairs(pairs, sigs, contents, cfg, exclude_sorted=exclude)
            return edges, metrics

        def build_edges_incremental():
            # Snapshot edge carry-forward (X62 extended to P4-P6, VERDICT r4
            # item 7): a verified edge is a pure function of (content_a,
            # content_b, edge config), so day-1 edges between contents still
            # present today are EXACT — only pairs touching the content
            # delta need LSH + verify. Day-1 edges are keyed by day-1 rep
            # ids; re-key them into today's rep ids through content_sha256
            # (both snapshots' signature tables carry the map). Inner joins
            # drop edges whose content vanished from today's corpus.
            #
            # Fresh pairs come from lsh.incremental_candidate_pairs (the
            # streaming generator): new-member x all-member candidates with
            # HISTORY-ANCHORED star caps. Both endpoints old => carried;
            # at least one endpoint new => generated here; the union is
            # exactly the full recompute's verified edge set whenever no
            # bucket crosses max_bucket_size between snapshots (cap-crossing
            # buckets change star topology, which can only alter which
            # TRUE-verified pairs are discovered, never admit false ones —
            # carried pairs all passed exact Jaccard). Equivalence on a
            # realistic planted corpus is pytest-pinned.
            prev_map = prev_signatures.select(
                F.col("rep_id").alias("prev_rep"), "content_sha256"
            )
            cur_map = sigs.select("rep_id", "content_sha256")
            rekey = prev_map.join(cur_map, "content_sha256").select("prev_rep", "rep_id")
            # barrier: carried feeds the metrics count AND the union write —
            # materialize the rekey joins once
            carried = verify.barrier(
                prev_edges.select("a_id", "b_id", "jaccard", "containment").join(
                    rekey.select(
                        F.col("prev_rep").alias("a_id"), F.col("rep_id").alias("new_a")
                    ),
                    "a_id",
                )
                .join(
                    rekey.select(
                        F.col("prev_rep").alias("b_id"), F.col("rep_id").alias("new_b")
                    ),
                    "b_id",
                )
                .select(
                    F.least("new_a", "new_b").alias("a_id"),
                    F.greatest("new_a", "new_b").alias("b_id"),
                    "jaccard",
                    "containment",
                )
            )
            flagged = sigs.join(
                prev_signatures.select("content_sha256").withColumn("_old", F.lit(True)),
                "content_sha256",
                "left",
            ).select("rep_id", "bands", F.col("_old").isNull().alias("is_new"))
            all_buckets = flagged.select(
                "rep_id", F.explode("bands").alias("band_hash"), "is_new"
            )
            new_buckets = all_buckets.where("is_new").select("band_hash", "rep_id")
            fresh_pairs = lsh.incremental_candidate_pairs(
                new_buckets, all_buckets, cfg.max_bucket_size
            )
            contents = signatures.with_identity(files).select(
                F.col("file_id").alias("rep_id"), "content"
            )
            fresh = verify.verify_pairs(
                fresh_pairs, sigs, contents, cfg, exclude_sorted=exclude
            )
            edges_out = carried.unionByName(fresh)
            metrics = {
                "edge_hash": cfg.edge_hash(),
                "carried_edges": int(carried.count()),
                "max_bucket_size_cap": cfg.max_bucket_size,
            }
            return edges_out, metrics

        edges = self._run_stage(
            self.T_EDGES,
            [self.T_SIG],
            build_edges if prev_edges is None else build_edges_incremental,
        )

        def build_clusters():
            e = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
            kw = (
                {}
                if self.cc_driver_threshold is None
                else {"driver_threshold": self.cc_driver_threshold}
            )
            comp = components.connected_components(e, **kw)
            # singletons: representatives with no verified edge
            singles = (
                sigs.select(F.col("rep_id").alias("node"))
                .join(comp.select("node"), "node", "left_anti")
                .withColumn("component", F.col("node"))
            )
            clusters = comp.unionByName(singles).select(
                F.col("node").alias("rep_id"), F.col("component").alias("cluster_id")
            )
            return clusters, {}

        clusters = self._run_stage(self.T_CLUSTERS, [self.T_EDGES], build_clusters)

        def build_clusters_all():
            # expand representative clusters back to every file (exact dups
            # rejoin via content_sha256); per-row invariant column preserved.
            # eqNullSafe: NULL-content files carry content_sha256 = NULL, and
            # a plain equi-join would silently drop them from the output
            # (cfg.null_value exists precisely because null docs are signed).
            with_id = signatures.with_identity(files)
            rep_map = sigs.select("content_sha256", "rep_id").join(clusters, "rep_id")
            lhs = with_id.select("file_id", "repo", "path", "commit", "lang", "content_sha256")
            rhs = rep_map.select(F.col("content_sha256").alias("rep_sha"), "cluster_id")
            out = lhs.join(
                rhs, lhs["content_sha256"].eqNullSafe(rhs["rep_sha"])
            ).drop("rep_sha")
            return out, {}

        return self._run_stage(
            self.T_CLUSTERS_ALL, [self.T_SIG, self.T_CLUSTERS], build_clusters_all
        )
