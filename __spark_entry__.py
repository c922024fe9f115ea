"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator suite over the driver tables
(documents, embeddings); ``oracle_sql()`` gives DuckDB-equivalent SQL for
every SQL-expressible query (same column names, same values). Queries whose
results depend on signature bytes (MinHash/SimHash kernels are not DuckDB-
computable) are rows-only here; their byte-exactness vs the reference's six
golden vectors is pinned by tests/test_kernel.py + tests/test_pipeline_fixture.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "67108864")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

from pyspark.sql import DataFrame, SparkSession

from minhash_spark.operators import clones as _clones
from minhash_spark.operators import media as _media
from minhash_spark.plans import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline (MinHash -> LSH -> exact verify ->
    connected components) on the sf0.001 documents table."""
    return Q.q_near_dup_clusters(spark, SF0001)


def _driver_evidence_rounds() -> dict[str, int]:
    """Newest CORRECTNESS_r*.json round in which each query earned driver
    evidence (green hash, or a rows-only record for no-oracle entries). A red
    row is not evidence. Used to self-rotate the 50-entry driver window."""
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", os.path.basename(f))
        if m is None:  # stray non-round file (CORRECTNESS_rerun.json, ...)
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        for k, v in rows.items():
            if v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            ):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness gate evaluates the FIRST 50
    # dict entries. Rotation discipline (VERDICT r4 item 1 / r5 item 1): no
    # query's newest driver-green row may become >1 round old. Rather than
    # hand-reordering each round (the round-5 bug: the repo shipped with its
    # own staleness guard red), the window is computed FROM the CORRECTNESS
    # files at call time: stalest evidence first (never-checked entries sort
    # as round 0), ties broken by name for determinism. The driver window
    # therefore self-rotates every round and tests/test_oracle_gate.py's two
    # window guards hold by construction.
    base = {
        # ---- (c) r3 cohort: newest driver row is r3 — refresh first -------
        "stratified_sample": Q.q_stratified_sample,
        "leakage_safe_split": Q.q_leakage_safe_split,
        "source_dedup_report": Q.q_source_dedup_report,
        "repetition_scores": Q.q_repetition_scores,
        "boilerplate_spans": Q.q_boilerplate_spans,
        "decontaminate": Q.q_decontaminate,
        "cross_corpus_near_dups": Q.q_cross_corpus_near_dups,
        "doc_fingerprints": Q.q_doc_fingerprints,
        "fingerprint_matches": Q.q_fingerprint_matches,
        "passage_dedup": Q.q_passage_dedup,
        "tfidf_top_terms": Q.q_tfidf_top_terms,
        "lm_scores": Q.q_lm_scores,
        "common_spans": Q.q_common_spans,
        "event_retention": Q.q_event_retention,
        "token_counts": Q.q_token_counts,
        "quality_scores": Q.q_quality_scores,
        "pricing_summary": Q.q_pricing_summary,
        "region_revenue": Q.q_region_revenue,
        "top_revenue_orders": Q.q_top_revenue_orders,
        "late_shipment_priority": Q.q_late_shipment_priority,
        "event_sessions": Q.q_event_sessions,
        "event_windowed_counts": Q.q_event_windowed_counts,
        "event_props_rollup": Q.q_event_props_rollup,
        "event_funnel": Q.q_event_funnel,
        # ---- (b) behavior changes this round: real multimodal decode ------
        "multimodal_features": Q.q_multimodal_features,
        "multimodal_frames": Q.q_multimodal_frames,
        # ---- (d) load-bearing dedup/ANN core (r4-green, kept fresh) -------
        "exact_dup_clusters": Q.q_exact_dup_clusters,
        "near_dup_pairs": Q.q_near_dup_pairs,
        "near_dup_clusters": Q.q_near_dup_clusters,
        "char_ngram_dup_pairs": Q.q_char_ngram_dup_pairs,
        "containment_dup_pairs": Q.q_containment_dup_pairs,
        "dedup_skew_report": Q.q_dedup_skew_report,
        # ---- (a) round-5 additions (never driver-checked) -----------------
        # bit_string:true surface parity (rows-only: murmur bytes)
        "minhash_bitstrings": Q.q_minhash_bitstrings,
        # IVF recall-vs-scan-cost calibration card (rows-only: IVF cells)
        "ann_operating_curve": Q.q_ann_operating_curve,
        # perceptual image near-dup over REAL decoded BMP pixels (X67)
        "image_phash_dedup": Q.q_image_phash_dedup,
        # GPT-style concat-and-chunk packing via two-phase prefix sum (X68)
        "sequence_packing": Q.q_sequence_packing,
        # temperature-smoothed training-mixture weights card (X69)
        "mixture_weights": Q.q_mixture_weights,
        # bloom-prefiltered decontamination, oracle shared with X18 (X70)
        "decontaminate_bloom": Q.q_decontaminate_bloom,
        # audio energy-envelope fingerprint near-dup over real WAV decode (X71)
        "audio_fingerprint_dedup": Q.q_audio_fingerprint_dedup,
        # epoch-reshuffled deterministic training order (X72)
        "training_order": Q.q_training_order,
        # video keyframe fingerprint near-dup over the real PPM walker (X73)
        "video_fingerprint_dedup": Q.q_video_fingerprint_dedup,
        # repo-level near-dup via the MinHash union monoid (X74)
        "repo_signature_dedup": Q.q_repo_signature_dedup,
        # first-seen 13-gram novelty attribution (X75)
        "novelty_scores": Q.q_novelty_scores,
        # ingestion-order distance card over verified dup pairs (X76)
        "dedup_locality": Q.q_dedup_locality,
        # crawl-contamination matrix: verified pairs by source pair (X77)
        "cross_source_dup_matrix": Q.q_cross_source_dup_matrix,
        # type-1/type-2 clone keys + cluster sizes, one-pattern-list oracle (X79)
        "normalized_clones": Q.q_normalized_clones,
        # type-2 clone-cluster cards: rename forks a raw-sha dedup misses (X79)
        "clone_forks": Q.q_clone_forks,
        # verified-graph degree histogram, composed pair oracle (X80)
        "dup_graph_degree": Q.q_dup_graph_degree,
        # per-source token savings under the representative keep policy (X81)
        "dedup_token_savings": Q.q_dedup_token_savings,
        # BPE-merge-step adjacent-pair counts, top-K both engines (X82)
        "bpe_pair_stats": Q.q_bpe_pair_stats,
        # ---- driver window boundary (first 50 dict entries) ---------------
        # r4-green entries below rotate back into the window next round
        # (incl. vocab / pii_scan / dedup_method_agreement / zipf_fit /
        # embedding_near_dup_clusters / source_rollup / embedding_topk,
        # displaced by the X67-X76 additions, and similar_docs_topk /
        # embedding_ann_lsh / embedding_ann_ivf displaced by X74-X76 — all
        # three carry hard pytest recall/contract gates, as do cluster_assign
        # / embedding_near_dup_pairs displaced by the X79 pair, and
        # exact_dup_pairs / near_dup_cluster_sizes / dedup_summary displaced
        # by X80-X82 — the dup-pair/cluster DAG those three report over
        # stays driver-exercised via near_dup_pairs/clusters + the composed
        # X80/X81 oracles); until then tools/check_oracles.py + pytest keep
        # them covered.
        "exact_dup_pairs": Q.q_exact_dup_pairs,
        "near_dup_cluster_sizes": Q.q_near_dup_cluster_sizes,
        "dedup_summary": Q.q_dedup_summary,
        "cluster_assign": Q.q_cluster_assign,
        "embedding_near_dup_pairs": Q.q_embedding_near_dup_pairs,
        "similar_docs_topk": Q.q_similar_docs_topk,
        "embedding_ann_lsh": Q.q_embedding_ann_lsh,
        "embedding_ann_ivf": Q.q_embedding_ann_ivf,
        "minhash_signatures": Q.q_minhash_signatures,
        "embedding_topk": Q.q_embedding_topk,
        "source_rollup": Q.q_source_rollup,
        "embedding_near_dup_clusters": Q.q_embedding_near_dup_clusters,
        "vocab": Q.q_vocab,
        "pii_scan": Q.q_pii_scan,
        "dedup_method_agreement": Q.q_dedup_method_agreement,
        "zipf_fit": Q.q_zipf_fit,
        "minhash_signatures_oph": Q.q_minhash_signatures_oph,
        "minhash_collapse": Q.q_minhash_collapse,
        "multi_signatures": Q.q_multi_signatures,
        "simhash_near_dup_pairs": Q.q_simhash_near_dup_pairs,
        "cluster_cohesion": Q.q_cluster_cohesion,
        "shard_manifest": Q.q_shard_manifest,
        "dedup_rewrite": Q.q_dedup_rewrite,
        "word_entropy_scores": Q.q_word_entropy_scores,
        "near_dup_threshold_sweep": Q.q_near_dup_threshold_sweep,
        "quality_weighted_sample": Q.q_quality_weighted_sample,
        "length_histogram": Q.q_length_histogram,
        "dedup_growth_curve": Q.q_dedup_growth_curve,
        "approx_corpus_profile": Q.q_approx_corpus_profile,
        "repeated_substring_scores": Q.q_repeated_substring_scores,
        "compression_scores": Q.q_compression_scores,
        "code_stats": Q.q_code_stats,
        "secret_scan": Q.q_secret_scan,
        "license_scan": Q.q_license_scan,
        "source_overlap": Q.q_source_overlap,
        "signature_similar_docs": Q.q_signature_similar_docs,
        "clean_text": Q.q_clean_text,
        "lang_marker_scores": Q.q_lang_marker_scores,
        "lang_id": Q.q_lang_id,
        "quality_filter": Q.q_quality_filter,
        "cluster_representatives": Q.q_cluster_representatives,
        "deterministic_sample": Q.q_deterministic_sample,
    }
    latest = _driver_evidence_rounds()
    return {
        name: base[name]
        for name in sorted(base, key=lambda n: (latest.get(n, 0), n))
    }


# tokenizer matches minhash_spark.tokenize.word_tokens ([0-9A-Za-z_]+ findall)
# exactly — not whitespace split — so the oracle does not depend on corpus
# punctuation purity.
_NEAR_DUP_PAIRS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS toks
  FROM t
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       len(list_intersect(a.toks, b.toks))::DOUBLE
         / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
"""


# char-9-gram Jaccard brute force over whitespace-normalized text (matches
# tokenize.char_shingles / kernel._ShingleBatch semantics: <=9 chars -> whole
# text as one shingle). The length-ratio prefilter is EXACT: with distinct
# shingle sets, J <= min(|A|,|B|)/max(|A|,|B|), so pairs failing the ratio
# cannot reach 0.8 — it only cuts oracle runtime, never results.
_CHAR_NGRAM_PAIRS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS s FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN length(s) <= 9 THEN [s]
              ELSE list_distinct(list_transform(generate_series(1, length(s)-8),
                   i -> substr(s, i, 9)))
         END AS toks
  FROM t WHERE length(s) > 0
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       len(list_intersect(a.toks, b.toks))::DOUBLE
         / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND least(len(a.toks), len(b.toks))::DOUBLE
       / greatest(len(a.toks), len(b.toks)) >= 0.8
WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
"""

_CONTAINMENT_PAIRS_SQL = """
    WITH t AS (
      SELECT doc_id, text, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w
      FROM documents
    ), d AS (
      SELECT doc_id,
             CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                  ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
             END AS toks,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
      FROM t
    ), p AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard,
             len(list_intersect(a.toks, b.toks))::DOUBLE
               / least(len(a.toks), len(b.toks)) AS containment,
             CASE WHEN length(a.norm) <= length(b.norm)
                  THEN position(a.norm IN b.norm) > 0
                  ELSE position(b.norm IN a.norm) > 0 END AS substr
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, jaccard, containment FROM p
    WHERE jaccard >= 0.8 OR (containment >= 0.9 AND substr)
"""

_NEAR_DUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({_NEAR_DUP_PAIRS_SQL}),
    und AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS comp FROM documents
      UNION
      SELECT und.v AS node, reach.comp
      FROM reach JOIN und ON und.u = reach.node
    )
    SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node
"""

_EMBEDDING_NEAR_DUP_PAIRS_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
"""

_EMBEDDING_TOPK_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    s AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(qv, v) AS cos
      FROM q, e WHERE e.vec_id != query_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rk
      FROM s
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rk AS rank
    FROM r WHERE rk <= 5
"""


# word-5-gram spans, same tokenizer + <n-token whole-text rule as the Spark
# side (queries._doc_spans)
_DOC_SPANS_SQL = """
    WITH tw AS (
      SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w FROM documents
    )
    SELECT doc_id,
           unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(w)-4),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                          w[i+3] || ' ' || w[i+4])) END) AS span
    FROM tw
"""


def _perceptual_oracle(hash_ctes: str, hex_col: str) -> str:
    """Shared brute-force tail for the three perceptual oracles (X67 image /
    X71 audio / X73 video): ``hash_ctes`` must end with a CTE named
    ``hashes(doc_id, hu)`` with hu UBIGINT; the tail enumerates all pairs at
    hamming <= PHASH_HAM_MAX and aggregates per-doc neighbor stats — one
    copy of the pairing semantics to maintain."""
    return f"""
        WITH {hash_ctes}, pairs AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 bit_count(xor(a.hu, b.hu))::BIGINT AS ham
          FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hu, b.hu)) <= {_media.PHASH_HAM_MAX}
        ), sym AS (
          SELECT da AS doc_id, ham FROM pairs
          UNION ALL SELECT db, ham FROM pairs
        ), agg AS (
          SELECT doc_id, COUNT(*)::BIGINT AS n_near,
                 MIN(ham)::BIGINT AS min_ham
          FROM sym GROUP BY doc_id
        )
        SELECT h.doc_id,
               lpad(lower(hex(h.hu)), 16, '0') AS {hex_col},
               COALESCE(a.n_near, 0)::BIGINT AS n_near,
               a.min_ham
        FROM hashes h LEFT JOIN agg a USING (doc_id)
        ORDER BY h.doc_id
    """


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_clusters": """
            SELECT sha256(text) AS content_sha256,
                   min(doc_id) AS cluster_id,
                   count(*) AS n_members
            FROM documents GROUP BY sha256(text)
        """,
        "exact_dup_pairs": """
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM documents a JOIN documents b
              ON sha256(a.text) = sha256(b.text) AND a.doc_id < b.doc_id
        """,
        "near_dup_pairs": _NEAR_DUP_PAIRS_SQL,
        # same shingle machinery + the containment branch: set containment
        # over the same word-3-gram sets, with the normalized-substring
        # witness (position() over ws-collapsed text — north rule)
        "containment_dup_pairs": _CONTAINMENT_PAIRS_SQL,
        "near_dup_clusters": _NEAR_DUP_CLUSTERS_SQL,
        "near_dup_cluster_sizes": f"""
            WITH clusters AS ({_NEAR_DUP_CLUSTERS_SQL}),
            sizes AS (
              SELECT cluster_id, count(*) AS cluster_size
              FROM clusters GROUP BY cluster_id
            )
            SELECT cluster_size, count(*) AS n_clusters
            FROM sizes GROUP BY cluster_size
        """,
        # cluster-quality diagnostics: min/max are order-independent, so the
        # per-edge jaccard doubles (already hash-pinned via near_dup_pairs)
        # stay bit-stable through the aggregation
        "cluster_cohesion": f"""
            WITH pairs AS ({_NEAR_DUP_PAIRS_SQL}),
            clusters AS ({_NEAR_DUP_CLUSTERS_SQL}),
            e AS (
              SELECT c.cluster_id, p.jaccard
              FROM pairs p JOIN clusters c ON p.a_id = c.doc_id
            ),
            sizes AS (
              SELECT cluster_id, count(*) AS cluster_size
              FROM clusters GROUP BY cluster_id
            )
            SELECT e.cluster_id,
                   s.cluster_size::BIGINT AS cluster_size,
                   count(*)::BIGINT AS n_edges,
                   min(e.jaccard) AS min_jaccard,
                   max(e.jaccard) AS max_jaccard
            FROM e JOIN sizes s ON e.cluster_id = s.cluster_id
            GROUP BY e.cluster_id, s.cluster_size
        """,
        "dedup_summary": f"""
            WITH pairs AS ({_NEAR_DUP_PAIRS_SQL}),
            clusters AS ({_NEAR_DUP_CLUSTERS_SQL})
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT count(DISTINCT sha256(text)) FROM documents) AS n_exact_unique,
                   (SELECT count(*) FROM pairs) AS n_near_dup_pairs,
                   (SELECT count(DISTINCT cluster_id) FROM clusters) AS n_clusters,
                   round((SELECT count(DISTINCT cluster_id) FROM clusters)::DOUBLE
                         / (SELECT count(*) FROM documents), 6) AS kept_ratio
        """,
        # X80: composed over the SAME brute-force pair SQL — a missed or
        # phantom verified edge shifts a degree bucket, so the histogram is
        # a full topology check of the edge DAG, not just a count.
        "dup_graph_degree": f"""
            WITH pairs AS ({_NEAR_DUP_PAIRS_SQL}),
            und AS (
              SELECT a_id AS doc_id FROM pairs
              UNION ALL
              SELECT b_id AS doc_id FROM pairs
            ),
            deg AS (
              SELECT doc_id, count(*)::BIGINT AS degree FROM und GROUP BY doc_id
            )
            SELECT degree, count(*)::BIGINT AS n_docs FROM deg GROUP BY degree
        """,
        # X81: recursive-CTE clusters + the X3 representative policy (max
        # n_chars, ties min doc_id) + the token_counts whitespace measure —
        # all three reused verbatim so the card cannot drift from its parts.
        "dedup_token_savings": f"""
            WITH clusters AS ({_NEAR_DUP_CLUSTERS_SQL}),
            d AS (
              SELECT doc_id, source, n_chars,
                     len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens
              FROM documents
            ),
            j AS (
              SELECT d.doc_id, d.source, d.n_chars, d.n_tokens, c.cluster_id
              FROM d JOIN clusters c USING (doc_id)
            ),
            reps AS (
              SELECT source, n_tokens FROM j
              QUALIFY row_number() OVER (PARTITION BY cluster_id
                                         ORDER BY n_chars DESC, doc_id) = 1
            ),
            kept AS (
              SELECT source, count(*)::BIGINT AS n_kept,
                     sum(n_tokens)::BIGINT AS tokens_kept
              FROM reps GROUP BY source
            ),
            tot AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     sum(n_tokens)::BIGINT AS tokens_total
              FROM j GROUP BY source
            )
            SELECT tot.source, n_docs,
                   coalesce(n_kept, 0)::BIGINT AS n_kept,
                   tokens_total,
                   coalesce(tokens_kept, 0)::BIGINT AS tokens_kept,
                   (tokens_total - coalesce(tokens_kept, 0))::BIGINT AS tokens_saved
            FROM tot LEFT JOIN kept USING (source)
        """,
        # X82: same word-token domain as the near-dup oracle; K interpolated
        # from the one Spark-side constant so the engines cannot desync.
        "bpe_pair_stats": f"""
            WITH t AS (
              SELECT regexp_extract_all(text, '[0-9A-Za-z_]+') AS w FROM documents
            ),
            p AS (
              SELECT unnest(list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1])) AS pair
              FROM t WHERE len(w) >= 2
            )
            SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY pair
            ORDER BY n DESC, pair LIMIT {Q.BPE_PAIR_TOP_K}
        """,
        "dedup_skew_report": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w
              FROM documents
            ), d AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct(list_transform(
                               generate_series(1, len(w)-2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                     END AS toks
              FROM t
            ), b AS (SELECT unnest(toks) AS bucket_key, doc_id FROM d),
            s AS (SELECT bucket_key, count(*) AS bucket_size FROM b
                  GROUP BY bucket_key)
            SELECT bucket_size::BIGINT AS bucket_size,
                   count(*)::BIGINT AS n_buckets,
                   max((bucket_size > {Q.SKEW_REPORT_CAP})::BIGINT)::BIGINT AS is_star,
                   sum(CASE WHEN bucket_size > {Q.SKEW_REPORT_CAP}
                            THEN bucket_size - 1
                            ELSE (bucket_size * (bucket_size - 1)) // 2
                       END)::BIGINT AS edges_emitted
            FROM s GROUP BY bucket_size
        """,
        # shard = content hash (sha256 mod 16) so DuckDB reproduces Spark's
        # membership byte-exactly; integer sums cast BIGINT (HUGEINT lesson)
        "shard_manifest": f"""
            WITH b AS (
              SELECT ('0x' || substr(sha256(text), 1, 8))::UBIGINT
                       % {Q.N_MANIFEST_SHARDS} AS shard,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks,
                     length(text) AS len, lang, source
              FROM documents
            )
            SELECT shard::BIGINT AS shard,
                   count(*)::BIGINT AS n_docs,
                   sum(n_toks)::BIGINT AS total_tokens,
                   sum(len)::BIGINT AS total_chars,
                   count(DISTINCT lang)::BIGINT AS n_langs,
                   count(DISTINCT source)::BIGINT AS n_sources
            FROM b GROUP BY shard
        """,
        # keep-first exact passage rewrite; owner key doc_id*2^20+pos mirrors
        # queries.py _CHUNK_KEY_BASE (chunks/doc < 2^20 bound documented there)
        "dedup_rewrite": f"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), c AS (
              SELECT doc_id,
                     unnest(generate_series(0, (len(w) + 31) // 32 - 1)) AS pos,
                     unnest(list_transform(
                       generate_series(0, (len(w) + 31) // 32 - 1),
                       i -> array_to_string(w[i*32+1 : i*32+32], ' '))) AS chunk
              FROM t
            ), g AS (
              SELECT chunk, min(doc_id * {Q._CHUNK_KEY_BASE} + pos) AS keep_key
              FROM c GROUP BY chunk
            ), k AS (
              SELECT c.doc_id, c.pos, c.chunk
              FROM c JOIN g USING (chunk)
              WHERE c.doc_id * {Q._CHUNK_KEY_BASE} + c.pos = g.keep_key
            ), nd AS (
              SELECT doc_id, ((len(w) + 31) // 32)::BIGINT AS n_chunks FROM t
            ), r AS (
              SELECT doc_id, count(*)::BIGINT AS n_kept,
                     string_agg(chunk, ' ' ORDER BY pos) AS text_kept
              FROM k GROUP BY doc_id
            )
            SELECT nd.doc_id, nd.n_chunks,
                   coalesce(r.n_kept, 0)::BIGINT AS n_kept,
                   coalesce(r.text_kept, '') AS text_kept
            FROM nd LEFT JOIN r USING (doc_id)
        """,
        # entropy rounded to 6 dp on both engines (engine-order float sums);
        # ttr is one exact int/int division — no rounding needed
        "word_entropy_scores": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), tok AS (
              SELECT doc_id, len(w) AS n, unnest(w) AS term FROM t
            ), cnt AS (
              SELECT doc_id, n, term, count(*) AS c
              FROM tok GROUP BY doc_id, n, term
            )
            SELECT doc_id,
                   max(n)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_distinct,
                   round(-sum((c::DOUBLE / n) * log2(c::DOUBLE / n)), 6) + 0.0
                     AS entropy,
                   count(*)::DOUBLE / max(n) AS ttr
            FROM cnt GROUP BY doc_id
        """,
        # incremental assignment: existing-only clusters via the same
        # recursive CTE restricted to the non-incoming slice; crossing edges
        # assign; count(DISTINCT cluster) is the would-merge signal
        "cluster_assign": f"""
            WITH RECURSIVE p0 AS ({_NEAR_DUP_PAIRS_SQL}),
            ex_pairs AS (
              SELECT a_id, b_id FROM p0
              WHERE a_id % 10 <> 7 AND b_id % 10 <> 7
            ),
            und AS (
              SELECT a_id AS u, b_id AS v FROM ex_pairs
              UNION ALL
              SELECT b_id AS u, a_id AS v FROM ex_pairs
            ),
            reach AS (
              SELECT doc_id AS node, doc_id AS comp FROM documents
              WHERE doc_id % 10 <> 7
              UNION
              SELECT und.v AS node, reach.comp
              FROM reach JOIN und ON und.u = reach.node
            ),
            clusters AS (
              SELECT node AS doc_id, min(comp) AS cluster_id
              FROM reach GROUP BY node
            ),
            crossing AS (
              SELECT CASE WHEN a_id % 10 = 7 THEN a_id ELSE b_id END AS new_id,
                     CASE WHEN a_id % 10 = 7 THEN b_id ELSE a_id END AS ex_id
              FROM p0 WHERE (a_id % 10 = 7) <> (b_id % 10 = 7)
            ),
            m AS (
              SELECT crossing.new_id, clusters.cluster_id
              FROM crossing JOIN clusters ON clusters.doc_id = crossing.ex_id
            )
            SELECT n.doc_id AS new_id,
                   coalesce(min(m.cluster_id), -1)::BIGINT AS assigned_cluster,
                   count(m.cluster_id)::BIGINT AS n_dup_neighbors,
                   count(DISTINCT m.cluster_id)::BIGINT AS n_clusters_hit
            FROM documents n LEFT JOIN m ON m.new_id = n.doc_id
            WHERE n.doc_id % 10 = 7
            GROUP BY n.doc_id
        """,
        # X60: agreement card over the three pinned pair sets. The flag merge
        # mirrors the Spark side's tagged-union + max() exactly; each source
        # CTE is the same SQL the per-method oracles use.
        "dedup_method_agreement": f"""
            WITH wordp AS ({_NEAR_DUP_PAIRS_SQL}),
            charp AS ({_CHAR_NGRAM_PAIRS_SQL}),
            contp AS ({_CONTAINMENT_PAIRS_SQL}),
            tagged AS (
              SELECT a_id, b_id, 1 AS w, 0 AS c, 0 AS t FROM wordp
              UNION ALL
              SELECT a_id, b_id, 0 AS w, 1 AS c, 0 AS t FROM charp
              UNION ALL
              SELECT a_id, b_id, 0 AS w, 0 AS c, 1 AS t FROM contp
            ),
            flags AS (
              SELECT a_id, b_id, max(w) AS w, max(c) AS c, max(t) AS t
              FROM tagged GROUP BY a_id, b_id
            )
            SELECT w = 1 AS in_word, c = 1 AS in_char, t = 1 AS in_containment,
                   count(*)::BIGINT AS n_pairs
            FROM flags GROUP BY 1, 2, 3
        """,
        # X61: Zipf fit over the top-K whitespace terms (same tokenization as
        # the vocab oracle); rank order total (n desc, term asc) both engines.
        # K interpolated from the same ZIPF_TOP_K the Spark side uses so the
        # SPARK_GRAFT_ZIPF_TOP_K override cannot desync the two engines.
        "zipf_fit": f"""
            WITH t AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents
            ),
            c AS (SELECT term, count(*) AS n FROM t GROUP BY term),
            top AS (SELECT term, n FROM c ORDER BY n DESC, term LIMIT {Q.ZIPF_TOP_K}),
            r AS (
              SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rank
              FROM top
            )
            SELECT count(*)::BIGINT AS n_terms,
                   round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
                   round(regr_r2(ln(n), ln(rank)), 6) AS zipf_r2
            FROM r
        """,
        "near_dup_threshold_sweep": f"""
            WITH p AS ({_NEAR_DUP_PAIRS_SQL}),
            th AS (SELECT unnest([0.80, 0.85, 0.90, 0.95])::DOUBLE AS threshold)
            SELECT th.threshold AS threshold,
                   count(p.a_id)::BIGINT AS n_pairs
            FROM th LEFT JOIN p ON p.jaccard >= th.threshold
            GROUP BY th.threshold
        """,
        # tier membership by integer cross-multiplication (n_stop*10 vs
        # k*n_tokens) — mirrors QW_TIERS_PERMILLE in queries.py
        "quality_weighted_sample": f"""
            WITH t AS (
              SELECT doc_id, lang, text,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), s AS (
              SELECT doc_id, lang, text,
                     len(w) AS n_tokens,
                     len(list_filter(w, x -> x IN
                         ('the','a','of','and','to','in','is','for'))) AS n_stop
              FROM t
            )
            SELECT doc_id, lang,
                   (CASE WHEN n_stop * 10 >= n_tokens * 3 THEN {Q.QW_TIERS_PERMILLE[0]}
                         WHEN n_stop * 10 >= n_tokens THEN {Q.QW_TIERS_PERMILLE[1]}
                         ELSE {Q.QW_DEFAULT_PERMILLE} END)::BIGINT AS keep_permille,
                   (('0x' || substr(sha256(text), 1, 8))::UBIGINT % 1000)::BIGINT
                     AS qw_bucket
            FROM s
            WHERE ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 1000
                  < CASE WHEN n_stop * 10 >= n_tokens * 3 THEN {Q.QW_TIERS_PERMILLE[0]}
                         WHEN n_stop * 10 >= n_tokens THEN {Q.QW_TIERS_PERMILLE[1]}
                         ELSE {Q.QW_DEFAULT_PERMILLE} END
        """,
        # log2 buckets via integer bit length (length(bin(n))) — no float
        # log2, so bucket edges can never straddle a libm ulp
        "length_histogram": """
            WITH b AS (
              SELECT CASE WHEN length(text) = 0 THEN 0
                          ELSE length(bin(length(text))) END AS len_bucket,
                     length(text) AS n
              FROM documents
            )
            SELECT len_bucket::BIGINT AS len_bucket,
                   count(*)::BIGINT AS n_docs,
                   min(n)::BIGINT AS min_len,
                   max(n)::BIGINT AS max_len,
                   sum(n)::BIGINT AS total_chars
            FROM b GROUP BY len_bucket
        """,
        "dedup_growth_curve": """
            WITH m AS (SELECT max(doc_id) AS mx FROM documents),
            q AS (SELECT unnest([1, 2, 3, 4]) AS quarter),
            d AS (SELECT doc_id, sha256(text) AS h FROM documents)
            SELECT q.quarter::BIGINT AS quarter,
                   (((m.mx + 1) * q.quarter) // 4)::BIGINT AS threshold,
                   count(CASE WHEN d.doc_id < ((m.mx + 1) * q.quarter) // 4
                              THEN 1 END)::BIGINT AS n_docs,
                   count(DISTINCT CASE WHEN d.doc_id < ((m.mx + 1) * q.quarter) // 4
                                       THEN d.h END)::BIGINT AS n_unique_texts
            FROM d, q, m
            GROUP BY q.quarter, m.mx
        """,
        "pii_scan": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{Q.PII_EMAIL_RE}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(text, '{Q.PII_IPV4_RE}'))::BIGINT AS n_ipv4,
                   len(regexp_extract_all(text, '{Q.PII_DIGITRUN_RE}'))::BIGINT AS n_digit_runs,
                   ((len(regexp_extract_all(text, '{Q.PII_EMAIL_RE}'))
                     + len(regexp_extract_all(text, '{Q.PII_IPV4_RE}'))
                     + len(regexp_extract_all(text, '{Q.PII_DIGITRUN_RE}'))) > 0)::BIGINT AS has_pii,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{Q.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{Q.PII_IPV4_RE}', '<IP>', 'g'),
                       '{Q.PII_DIGITRUN_RE}', '<NUM>', 'g') AS redacted_text
            FROM documents
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   len(regexp_extract_all(text,
                       '''?[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]+')) AS n_bpe_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "quality_scores": """
            WITH t AS (
              SELECT doc_id, text,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            )
            SELECT doc_id,
                   length(text) AS n_chars_actual,
                   len(w) AS n_tokens,
                   length(text)::DOUBLE / len(w) AS chars_per_token,
                   len(list_filter(w, x -> list_contains(
                       ['the','a','of','and','to','in','is','for'], x)))::DOUBLE
                     / len(w) AS stopword_ratio,
                   length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
                     / length(text) AS punct_ratio
            FROM t
        """,
        "lang_marker_scores": """
            WITH t AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            )
            SELECT doc_id, lang,
                   len(list_filter(w, x -> list_contains(['the','and'], x))) AS score_en,
                   len(list_filter(w, x -> list_contains(['der','und'], x))) AS score_de,
                   len(list_filter(w, x -> list_contains(['le','et'], x))) AS score_fr,
                   len(list_filter(w, x -> list_contains(['el','y'], x))) AS score_es,
                   len(list_filter(w, x -> list_contains(['de','shi'], x))) AS score_zh
            FROM t
        """,
        "lang_id": """
            WITH t AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), s AS (
              SELECT doc_id, lang,
                     len(list_filter(w, x -> list_contains(['the','and'], x))) AS s_en,
                     len(list_filter(w, x -> list_contains(['der','und'], x))) AS s_de,
                     len(list_filter(w, x -> list_contains(['le','et'], x))) AS s_fr,
                     len(list_filter(w, x -> list_contains(['el','y'], x))) AS s_es,
                     len(list_filter(w, x -> list_contains(['de','shi'], x))) AS s_zh
              FROM t
            ), p AS (
              SELECT doc_id, lang,
                     CASE WHEN greatest(s_en,s_de,s_fr,s_es,s_zh) = 0 THEN 'und'
                          WHEN s_en = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'en'
                          WHEN s_de = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'de'
                          WHEN s_fr = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'fr'
                          WHEN s_es = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'es'
                          ELSE 'zh' END AS pred_lang
              FROM s
            )
            SELECT doc_id, lang, pred_lang,
                   (pred_lang = lang)::BIGINT AS is_correct
            FROM p
        """,
        "quality_filter": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), r AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 30 THEN 'too_short'
                          WHEN len(list_filter(w, x -> list_contains(
                               ['the','a','of','and','to','in','is','for'], x)))::DOUBLE
                               / len(w) < 0.05 THEN 'low_stopword'
                          ELSE 'ok' END AS reason
              FROM t
            )
            SELECT doc_id, reason, (reason = 'ok')::BIGINT AS keep FROM r
        """,
        "source_rollup": """
            SELECT source, lang,
                   count(*) AS n_docs,
                   sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT AS total_tokens,
                   sum(length(text))::DOUBLE / count(*) AS avg_chars
            FROM documents GROUP BY source, lang
        """,
        "cluster_representatives": f"""
            WITH clusters AS ({_NEAR_DUP_CLUSTERS_SQL}),
            j AS (
              SELECT c.cluster_id, d.doc_id, d.n_chars
              FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
            ),
            r AS (
              SELECT cluster_id, doc_id, n_chars,
                     row_number() OVER (PARTITION BY cluster_id
                                        ORDER BY n_chars DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY cluster_id) AS cluster_size
              FROM j
            )
            SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_n_chars,
                   cluster_size
            FROM r WHERE rn = 1
        """,
        "vocab": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents
            )
            SELECT term, count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS doc_freq
            FROM t GROUP BY term
        """,
        "deterministic_sample": """
            SELECT doc_id, lang, source,
                   ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 10 AS bucket
            FROM documents
            WHERE ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 10 = 0
        """,
        # mirrors MIX_WEIGHTS_PERMILLE / MIX_DEFAULT_PERMILLE in queries.py
        "stratified_sample": """
            WITH b AS (
              SELECT doc_id, lang, source,
                     ('0x' || substr(sha256(text), 1, 8))::UBIGINT % 1000 AS mix_bucket,
                     CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 500
                               WHEN 'fr' THEN 500 WHEN 'es' THEN 250
                               WHEN 'zh' THEN 250 ELSE 100 END AS rate
              FROM documents
            )
            SELECT doc_id, lang, source, mix_bucket::BIGINT AS mix_bucket
            FROM b WHERE mix_bucket < rate
        """,
        "leakage_safe_split": f"""
            WITH clusters AS ({_NEAR_DUP_CLUSTERS_SQL}),
            s AS (
              SELECT doc_id, cluster_id,
                     ('0x' || substr(sha256(CAST(cluster_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b
              FROM clusters
            )
            SELECT doc_id, cluster_id,
                   CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
            FROM s
        """,
        "source_dedup_report": f"""
            WITH clusters AS ({_NEAR_DUP_CLUSTERS_SQL})
            SELECT d.source,
                   count(*) AS n_docs,
                   count(DISTINCT sha256(d.text)) AS n_exact_unique,
                   count(DISTINCT c.cluster_id) AS n_clusters,
                   1.0 - count(DISTINCT c.cluster_id)::DOUBLE / count(*) AS near_dup_ratio
            FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
            GROUP BY d.source
        """,
        # TPC-H-shaped relational queries: DECIMAL arithmetic end to end
        # (exact, order-independent sums on both engines), final cast to
        # double — float summation order can never flip the value hash.
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity::DECIMAL(12,2))::DOUBLE AS sum_qty,
                   sum(l_extendedprice::DECIMAL(12,2))::DOUBLE AS sum_base_price,
                   sum(l_extendedprice::DECIMAL(12,2)
                       * (1.00 - l_discount::DECIMAL(3,2)))::DOUBLE AS sum_disc_price,
                   sum(l_extendedprice::DECIMAL(12,2)
                       * (1.00 - l_discount::DECIMAL(3,2))
                       * (1.00 + l_tax::DECIMAL(3,2)))::DOUBLE AS sum_charge,
                   sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*) AS avg_qty,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "region_revenue": """
            SELECT n.n_name,
                   sum(l.l_extendedprice::DECIMAL(12,2)
                       * (1.00 - l.l_discount::DECIMAL(3,2)))::DOUBLE AS revenue,
                   count(*)::BIGINT AS n_items
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
            JOIN orders o ON o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             AND o.o_orderdate <  TIMESTAMP '1998-01-01'
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY n.n_name
        """,
        "top_revenue_orders": """
            SELECT o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o.o_orderpriority,
                   sum(l.l_extendedprice::DECIMAL(12,2)
                       * (1.00 - l.l_discount::DECIMAL(3,2)))::DOUBLE AS revenue
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > TIMESTAMP '1997-06-01'
            WHERE o.o_orderdate < TIMESTAMP '1997-06-01'
              AND EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_mktsegment = 'BUILDING')
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, o.o_orderkey ASC
            LIMIT 10
        """,
        "late_shipment_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
        """,
        "event_sessions": """
            WITH e AS (
              SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS epoch
              FROM events
            ),
            g AS (
              SELECT user_id, event_id, epoch,
                     CASE WHEN epoch - lag(epoch) OVER
                               (PARTITION BY user_id ORDER BY epoch, event_id)
                               > 1800
                            OR lag(epoch) OVER
                               (PARTITION BY user_id ORDER BY epoch, event_id)
                               IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM e
            ),
            s AS (
              SELECT user_id, epoch,
                     sum(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY epoch, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM g
            )
            SELECT user_id, session_idx::BIGINT AS session_idx,
                   count(*) AS n_events,
                   min(epoch) AS start_epoch,
                   max(epoch) AS end_epoch,
                   max(epoch) - min(epoch) AS duration_s
            FROM s GROUP BY user_id, session_idx
        """,
        "similar_docs_topk": """
            WITH t0 AS (
              SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w
              FROM documents
            ), t AS (
              SELECT doc_id,
                     CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct(list_transform(
                               generate_series(1, len(w)-2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                     END AS toks
              FROM t0
            ), q AS (
              SELECT doc_id AS query_id, toks AS qtoks FROM t WHERE doc_id < 10
            ), s AS (
              SELECT q.query_id, t.doc_id,
                     round(len(list_intersect(q.qtoks, t.toks))::DOUBLE
                           / (len(q.qtoks) + len(t.toks)
                              - len(list_intersect(q.qtoks, t.toks))), 6) AS jaccard
              FROM q JOIN t ON t.doc_id != q.query_id
            ), r AS (
              SELECT query_id, doc_id, jaccard,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY jaccard DESC, doc_id) AS rank
              FROM s
            )
            SELECT query_id, doc_id, jaccard, rank FROM r WHERE rank <= 5
        """,
        # ordered funnel: conditional first-occurrence chain; epochs floored
        # to whole seconds on both engines so the strict > comparisons agree
        "event_funnel": """
            WITH e AS (
              SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS ep
              FROM events
            ), t1 AS (
              SELECT user_id, min(ep) AS t_view FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), t2 AS (
              SELECT e.user_id, min(ep) AS t_click
              FROM e JOIN t1 ON e.user_id = t1.user_id
              WHERE e.event_type = 'click' AND e.ep > t1.t_view
              GROUP BY e.user_id
            ), t3 AS (
              SELECT e.user_id, min(ep) AS t_purchase
              FROM e JOIN t2 ON e.user_id = t2.user_id
              WHERE e.event_type = 'purchase' AND e.ep > t2.t_click
              GROUP BY e.user_id
            )
            SELECT t1.user_id, t1.t_view,
                   coalesce(t2.t_click, 0)::BIGINT AS t_click,
                   coalesce(t3.t_purchase, 0)::BIGINT AS t_purchase,
                   (CASE WHEN t3.t_purchase IS NOT NULL THEN 3
                         WHEN t2.t_click IS NOT NULL THEN 2
                         ELSE 1 END)::BIGINT AS step_reached
            FROM t1
            LEFT JOIN t2 ON t2.user_id = t1.user_id
            LEFT JOIN t3 ON t3.user_id = t1.user_id
        """,
        "event_retention": """
            WITH e AS (
              SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
              FROM events
            ), first AS (
              SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
            )
            SELECT f.cohort_day,
                   date_diff('day', f.cohort_day::DATE, e.day::DATE)::BIGINT
                     AS day_offset,
                   count(*)::BIGINT AS n_users
            FROM e JOIN first f ON f.user_id = e.user_id
            GROUP BY 1, 2
        """,
        "event_windowed_counts": """
            SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT
                     AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "event_props_rollup": """
            SELECT event_type,
                   count(*)::BIGINT AS n_events,
                   sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
                   max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
            FROM events GROUP BY event_type
        """,
        "common_spans": f"""
            WITH s AS ({_DOC_SPANS_SQL})
            SELECT span, count(*)::BIGINT AS df
            FROM s GROUP BY span
            ORDER BY df DESC, span ASC LIMIT 20
        """,
        "clean_text": """
            WITH c AS (
              SELECT doc_id, text,
                     trim(regexp_replace(
                       regexp_replace(text, '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                       '\\s+', ' ', 'g')) AS clean_text
              FROM documents
            )
            SELECT doc_id, length(text)::BIGINT AS n_chars_raw,
                   clean_text, length(clean_text)::BIGINT AS n_chars_clean
            FROM c
        """,
        # Real PPM frame parsing on the Spark side (operators/media.py); the
        # oracle reproduces the synth closed form analytically: n_frames/W/H
        # are mod-formulas of doc_id, the frame sum is sum over (r, c, ch) of
        # (doc_id + 19f + 7r + 3c + 5ch) % 256. A header-scan bug in the
        # parser (wrong frame offset) diverges here at the value hash.
        "multimodal_frames": """
            WITH v AS (
              SELECT doc_id,
                     (4 + doc_id % 5) AS n_frames,
                     (8 + doc_id % 9) AS w,
                     (4 + doc_id % 7) AS h
              FROM documents
            ), s AS (
              SELECT doc_id, n_frames, w, h, si,
                     (si * n_frames) // 4 AS frame_idx
              FROM v, LATERAL (SELECT unnest([0, 1, 2, 3]) AS si)
            )
            SELECT s.doc_id,
                   s.si::BIGINT AS sample_i,
                   s.frame_idx::BIGINT AS frame_idx,
                   s.n_frames::BIGINT AS n_frames,
                   s.w::BIGINT AS width,
                   s.h::BIGINT AS height,
                   sum((s.doc_id + 19 * s.frame_idx + 7 * rr.r + 3 * cc.c
                        + 5 * hh.ch) % 256)::BIGINT AS frame_sum
            FROM s,
                 LATERAL (SELECT unnest(range(0, s.h)) AS r) rr,
                 LATERAL (SELECT unnest(range(0, s.w)) AS c) cc,
                 LATERAL (SELECT unnest([0, 1, 2]) AS ch) hh
            GROUP BY 1, 2, 3, 4, 5, 6
        """,
        "repetition_scores": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), d AS (
              SELECT doc_id, w,
                     list_transform(generate_series(1, len(w)-1),
                                    i -> w[i] || ' ' || w[i+1]) AS bg
              FROM t WHERE len(w) >= 2
            )
            SELECT doc_id,
                   len(w)::BIGINT AS n_tokens,
                   len(list_distinct(w))::BIGINT AS n_distinct,
                   len(list_distinct(w))::DOUBLE / len(w) AS distinct_ratio,
                   list_max(list_transform(list_distinct(w),
                       u -> len(list_filter(w, x -> x = u))))::DOUBLE / len(w)
                     AS top_token_ratio,
                   list_max(list_transform(list_distinct(bg),
                       u -> len(list_filter(bg, x -> x = u))))::DOUBLE / len(bg)
                     AS top_bigram_ratio
            FROM d
        """,
        "boilerplate_spans": f"""
            WITH s AS ({_DOC_SPANS_SQL}),
            df AS (SELECT span, count(*) AS df FROM s GROUP BY span)
            SELECT s.doc_id,
                   count(*)::BIGINT AS n_spans,
                   sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
                   sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*)
                     AS shared_ratio
            FROM s JOIN df USING (span) GROUP BY s.doc_id
        """,
        "decontaminate": f"""
            WITH s AS ({_DOC_SPANS_SQL})
            SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                   count(*)::BIGINT AS n_shared_spans
            FROM s tr JOIN s ev USING (span)
            WHERE tr.doc_id >= 20 AND ev.doc_id < 20
            GROUP BY 1, 2
        """,
        # X70: bloom prefilter + exact join == exact join (no false
        # negatives), so the oracle is IDENTICAL to X18's — the driver gate
        # proves the bloom path drops nothing on every run.
        "decontaminate_bloom": f"""
            WITH s AS ({_DOC_SPANS_SQL})
            SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                   count(*)::BIGINT AS n_shared_spans
            FROM s tr JOIN s ev USING (span)
            WHERE tr.doc_id >= 20 AND ev.doc_id < 20
            GROUP BY 1, 2
        """,
        # passage = consecutive 32-token windows of the whitespace token
        # stream (same trim/split as token_counts); dup iff the passage text
        # occurs >1 time corpus-wide
        "passage_dedup": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ), c AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(0, (len(w) + 31) // 32 - 1),
                       i -> array_to_string(w[i*32+1 : i*32+32], ' '))) AS chunk
              FROM t
            ), g AS (
              SELECT chunk, count(*) AS gc FROM c GROUP BY chunk
            )
            SELECT c.doc_id,
                   count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN g.gc > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
                   sum(CASE WHEN g.gc > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
                     AS dup_ratio
            FROM c JOIN g USING (chunk) GROUP BY c.doc_id
        """,
        # tf/df is rational -> exact in doubles on both engines (ln-based idf
        # would diverge in the last ulp and break the value hash)
        "tfidf_top_terms": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term
            ), df AS (
              SELECT term, count(*) AS df FROM tf GROUP BY term
            ), s AS (
              SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     tf.tf::DOUBLE / df.df AS score,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf::DOUBLE / df.df DESC,
                                                 tf.term ASC) AS rank
              FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, tf::BIGINT AS tf, df::BIGINT AS df, score,
                   rank::BIGINT AS rank
            FROM s WHERE rank <= 3
        """,
        # integer numerator/denominator sums (order-independent), one final
        # division -> bit-stable across engines
        "lm_scores": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term
            ), g AS (
              SELECT term, sum(tf) AS gc FROM tf GROUP BY term
            ), tot AS (
              SELECT sum(gc) AS total FROM g
            )
            SELECT tf.doc_id,
                   sum(tf.tf)::BIGINT AS n_tokens,
                   sum(tf.tf * g.gc)::BIGINT::DOUBLE
                     / (sum(tf.tf)::BIGINT * (SELECT total FROM tot)) AS lm_score
            FROM tf JOIN g USING (term)
            GROUP BY tf.doc_id
        """,
        # cross-corpus near-dups: brute-force eval x train word-3-gram
        # Jaccard (same tokenizer as near_dup_pairs); LSH candidate recall at
        # 0.8 is the same S-curve as near_dup_pairs (oracle-matched), so the
        # exact SQL is the expected output
        "cross_corpus_near_dups": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(text, '[0-9A-Za-z_]+') AS w FROM documents
            ), d AS (
              SELECT doc_id,
                     CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                     END AS toks
              FROM t
            )
            SELECT a.doc_id AS eval_id, b.doc_id AS train_id,
                   len(list_intersect(a.toks, b.toks))::DOUBLE
                     / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
            FROM d a JOIN d b ON a.doc_id < 20 AND b.doc_id >= 20
            WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
        """,
        "embedding_topk": _EMBEDDING_TOPK_SQL,
        # the ANN's measured recall is 1.0 on the driver corpora (b=4, L=32
        # tuned to the corpus's near-random cosine operating point), so the
        # exact brute-force top-5 IS the expected ANN output here.
        "embedding_ann_lsh": _EMBEDDING_TOPK_SQL,
        # embedding_ann_ivf is rows-only BY DESIGN: the sandbox embeddings are
        # near-random (median pairwise cos ~ 0, true top-5 at ~0.4), where NO
        # cell-probing index reaches recall 1.0 sublinearly — IVF probes
        # nprobe/nlist of the corpus and k-means cells are not SQL-expressible.
        # Its recall-1.0 behavior on a CLUSTERED (dedup-grade) corpus is
        # pytest-pinned instead (tests/test_queries.py::test_embedding_ann_ivf_*).
        "char_ngram_dup_pairs": _CHAR_NGRAM_PAIRS_SQL,
        # LSH candidate recall at tau=0.45 measured 1.0 on every SF, so the
        # exact all-pairs SQL is the expected output (see q_embedding_near_dup_pairs)
        "embedding_near_dup_pairs": _EMBEDDING_NEAR_DUP_PAIRS_SQL,
        "embedding_near_dup_clusters": f"""
            WITH RECURSIVE epairs AS ({_EMBEDDING_NEAR_DUP_PAIRS_SQL}),
            und AS (
              SELECT a_id AS u, b_id AS v FROM epairs
              UNION ALL
              SELECT b_id AS u, a_id AS v FROM epairs
            ),
            reach AS (
              SELECT vec_id AS node, vec_id AS comp FROM embeddings
              UNION
              SELECT und.v AS node, reach.comp
              FROM reach JOIN und ON und.u = reach.node
            )
            SELECT node AS vec_id, min(comp) AS cluster_id FROM reach GROUP BY node
        """,
        # Real BMP/WAV decode on the Spark side (operators/media.py); the
        # oracle computes every decoded feature analytically from the synth
        # closed forms (even doc_id -> BMP gradient image, odd -> PCM16 WAV
        # chirp). n_bytes pins container overhead: BMP = 54 + H*ceil4(3W),
        # WAV = 44 + 2*n_samples. A stride/flip/chunk-walk decode bug
        # diverges at the value hash, not just row counts.
        "multimodal_features": """
            WITH img AS (
              SELECT d.doc_id,
                     (16 + d.doc_id % 17) AS w,
                     (8 + d.doc_id % 13) AS h,
                     sum((3 * d.doc_id + 11 * rr.r + cc.c) % 256) AS sum_r,
                     sum((2 * d.doc_id + rr.r + 5 * cc.c) % 256) AS sum_g,
                     sum((d.doc_id + 7 * rr.r + 3 * cc.c) % 256) AS sum_b,
                     sum(((3 * d.doc_id + 11 * rr.r + cc.c) % 256
                          + 2 * ((2 * d.doc_id + rr.r + 5 * cc.c) % 256)
                          + (d.doc_id + 7 * rr.r + 3 * cc.c) % 256) // 4)
                       AS sum_luma_q4
              FROM documents d,
                   LATERAL (SELECT unnest(range(0, 8 + d.doc_id % 13)) AS r) rr,
                   LATERAL (SELECT unnest(range(0, 16 + d.doc_id % 17)) AS c) cc
              WHERE d.doc_id % 2 = 0
              GROUP BY 1, 2, 3
            ), aud AS (
              SELECT doc_id, (256 + (doc_id % 128) * 16) AS n
              FROM documents WHERE doc_id % 2 = 1
            ), audagg AS (
              SELECT a.doc_id, a.n,
                     sum((37 * a.doc_id + tt.t * tt.t) % 4096 - 2048) AS sum_sample,
                     sum(abs((37 * a.doc_id + tt.t * tt.t) % 4096 - 2048))
                       AS sum_abs_sample
              FROM aud a, LATERAL (SELECT unnest(range(0, a.n)) AS t) tt
              GROUP BY 1, 2
            )
            SELECT doc_id, 'image/bmp' AS mime,
                   (54 + h * ((3 * w + 3) // 4 * 4))::BIGINT AS n_bytes,
                   w::BIGINT AS width, h::BIGINT AS height,
                   sum_r::BIGINT AS sum_r, sum_g::BIGINT AS sum_g,
                   sum_b::BIGINT AS sum_b, sum_luma_q4::BIGINT AS sum_luma_q4,
                   NULL::BIGINT AS sample_rate, NULL::BIGINT AS n_samples,
                   NULL::BIGINT AS sum_sample, NULL::BIGINT AS sum_abs_sample,
                   NULL::BIGINT AS duration_ms
            FROM img
            UNION ALL
            SELECT doc_id, 'audio/wav' AS mime,
                   (44 + 2 * n)::BIGINT AS n_bytes,
                   NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
                   NULL::BIGINT, NULL::BIGINT,
                   8000::BIGINT AS sample_rate, n::BIGINT AS n_samples,
                   sum_sample::BIGINT AS sum_sample,
                   sum_abs_sample::BIGINT AS sum_abs_sample,
                   (n * 1000 // 8000)::BIGINT AS duration_ms
            FROM audagg
        """,
        # code-file stats/filter: mean line length recovered arithmetically
        # (n_chars - separators) / n_lines — one exact int/int division, so
        # the double is bit-identical on both engines
        "code_stats": """
            WITH t AS (
              SELECT doc_id, text, string_split(text, chr(10)) AS ls,
                     length(text) AS nc
              FROM documents
            ), s AS (
              SELECT doc_id, nc, len(ls) AS n_lines,
                     list_max(list_transform(ls, l -> length(l))) AS max_line_len,
                     (nc - (len(ls) - 1))::DOUBLE / len(ls) AS avg_line_len,
                     CASE WHEN nc > 0
                          THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / nc
                          ELSE 0.0 END AS alpha_ratio,
                     (lower(text) LIKE '%generated by%'
                      OR lower(text) LIKE '%do not edit%'
                      OR lower(text) LIKE '%autogenerated%') AS autogen
              FROM t
            ), r AS (
              SELECT doc_id, n_lines, max_line_len, avg_line_len, alpha_ratio,
                     CASE WHEN autogen THEN 'autogenerated'
                          WHEN max_line_len > 1000 THEN 'long_line'
                          WHEN avg_line_len > 100 THEN 'high_avg_line'
                          WHEN alpha_ratio < 0.25 THEN 'low_alpha'
                          ELSE 'ok' END AS reason
              FROM s
            )
            SELECT doc_id, n_lines::BIGINT AS n_lines,
                   max_line_len::BIGINT AS max_line_len,
                   avg_line_len, alpha_ratio, reason,
                   (reason = 'ok')::BIGINT AS keep
            FROM r
        """,
        # identical pattern text on both engines (Java-regex ∩ RE2 subset,
        # see queries.SECRET_PATTERNS); redaction order fixed
        "secret_scan": """
            WITH r AS (
              SELECT doc_id,
                     len(regexp_extract_all(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                     len(regexp_extract_all(text, 'AKIA[0-9A-Z]{16}')) AS n_aws_keys,
                     len(regexp_extract_all(text,
                         '-----BEGIN [A-Z ]*PRIVATE KEY-----')) AS n_priv_keys,
                     len(regexp_extract_all(text, '\\b[0-9a-f]{32,}\\b')) AS n_hex_secrets,
                     len(regexp_extract_all(text,
                         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ipv4,
                     regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         'AKIA[0-9A-Z]{16}', '<AWS_KEY>', 'g'),
                         '-----BEGIN [A-Z ]*PRIVATE KEY-----', '<PRIV_KEY>', 'g'),
                         '\\b[0-9a-f]{32,}\\b', '<HEX_SECRET>', 'g'),
                         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                         '<IPV4>', 'g') AS redacted_text
              FROM documents
            )
            SELECT doc_id,
                   n_emails::BIGINT AS n_emails,
                   n_aws_keys::BIGINT AS n_aws_keys,
                   n_priv_keys::BIGINT AS n_priv_keys,
                   n_hex_secrets::BIGINT AS n_hex_secrets,
                   n_ipv4::BIGINT AS n_ipv4,
                   (n_emails + n_aws_keys + n_priv_keys + n_hex_secrets
                    + n_ipv4)::BIGINT AS n_secrets,
                   (n_emails + n_aws_keys + n_priv_keys + n_hex_secrets
                    + n_ipv4 > 0)::BIGINT AS has_secrets,
                   redacted_text
            FROM r
        """,
        # license detection: SPDX tag first, marker phrases second — the
        # CASE order mirrors operators/curation.py:license_columns verbatim;
        # both engines' regexp_extract return '' on no match
        "license_scan": """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract(text,
                       'SPDX-License-Identifier:[ \t]*([0-9A-Za-z.+-]+)',
                       1) AS spdx_id,
                     lower(text) AS low
              FROM documents
            ), f AS (
              SELECT doc_id, spdx_id, low,
                     CASE
                       WHEN lower(spdx_id) LIKE 'mit%' THEN 'mit'
                       WHEN lower(spdx_id) LIKE 'apache%' THEN 'apache'
                       WHEN lower(spdx_id) LIKE 'bsd%' THEN 'bsd'
                       WHEN contains(lower(spdx_id), 'gpl') THEN 'gpl'
                       WHEN spdx_id <> '' THEN 'other'
                       WHEN contains(low,
                         'permission is hereby granted, free of charge')
                         THEN 'mit'
                       WHEN contains(low, 'licensed under the apache license')
                         THEN 'apache'
                       WHEN contains(low,
                         'redistribution and use in source and binary forms')
                         THEN 'bsd'
                       WHEN contains(low, 'gnu general public license')
                         THEN 'gpl'
                       ELSE 'unknown'
                     END AS license_family
              FROM t
            )
            SELECT doc_id, spdx_id, license_family,
                   (license_family IN ('mit', 'apache', 'bsd'))::BIGINT
                     AS permissive,
                   contains(low, 'copyright')::BIGINT AS has_copyright
            FROM f
        """,
        # collection overlap: exact integer set sizes -> one int/int division
        "source_overlap": """
            WITH u AS (
              SELECT source,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents
            ), t AS (
              SELECT DISTINCT source, term FROM u
            ), sz AS (
              SELECT source, count(*) AS n FROM t GROUP BY source
            ), sh AS (
              SELECT a.source AS a_source, b.source AS b_source,
                     count(*) AS n_shared
              FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
              GROUP BY 1, 2
            )
            SELECT a_source, b_source,
                   n_shared::BIGINT AS n_shared,
                   sa.n::BIGINT AS n_a_terms,
                   sb.n::BIGINT AS n_b_terms,
                   n_shared::DOUBLE / (sa.n + sb.n - n_shared) AS jaccard
            FROM sh
            JOIN sz sa ON sa.source = sh.a_source
            JOIN sz sb ON sb.source = sh.b_source
        """,
        # X67 perceptual image near-dup: the oracle recomputes the dHash
        # ANALYTICALLY from the planted image's closed form (media.py:
        # synth_phash_image / dhash64 — R=G=B=v so luma (R+2G+B)//4 == v;
        # sample grid row (y*H)//8, col (x*W)//9; bit y*8+x set iff the
        # right sample exceeds the left) and brute-forces ALL pairs at
        # hamming <= 3 — so it checks BOTH the real BMP decode path and the
        # pigeonhole band join's guaranteed recall. Hash accumulates in
        # HUGEINT (bit 63 overflows BIGINT shifts) then casts to UBIGINT
        # for xor/bit_count/hex.
        "image_phash_dedup": _perceptual_oracle(
            f"""p AS (
              SELECT doc_id, doc_id % {_media.PHASH_GROUPS} AS g,
                     16 + (doc_id % {_media.PHASH_GROUPS}) % 17 AS w,
                     8 + (doc_id % {_media.PHASH_GROUPS}) % 13 AS h
              FROM documents
            ), pos AS (
              SELECT doc_id, g, w,
                     ys.y * 8 + xs.x AS idx,
                     (ys.y * h) // 8 AS r,
                     (xs.x * w) // 9 AS c1,
                     ((xs.x + 1) * w) // 9 AS c2
              FROM p, range(8) ys(y), range(8) xs(x)
            ), bits AS (
              SELECT doc_id, idx,
                     (( (17*g + (3 + 5*g)*r + (2 + 3*g)*c1) % 256
                        + 200 * ((r*w + c1 + doc_id) % 97 = 0)::INT ) % 256
                      <
                      ( (17*g + (3 + 5*g)*r + (2 + 3*g)*c2) % 256
                        + 200 * ((r*w + c2 + doc_id) % 97 = 0)::INT ) % 256
                     )::INT AS bit
              FROM pos
            ), hashes AS (
              SELECT doc_id,
                     SUM(bit * (1::HUGEINT << idx))::UBIGINT AS hu
              FROM bits GROUP BY doc_id
            )""",
            "phash_hex",
        ),
        # X73 video keyframe fingerprint: the keyframe index is group-
        # determined (n_frames//2), so the oracle samples the right frame's
        # closed form; same dHash grid and brute-force pairing as X67.
        "video_fingerprint_dedup": _perceptual_oracle(
            f"""p AS (
              SELECT doc_id, doc_id % {_media.VFP_GROUPS} AS g,
                     (4 + (doc_id % {_media.VFP_GROUPS}) % 5) // 2 AS kf,
                     16 + (doc_id % {_media.VFP_GROUPS}) % 13 AS w,
                     8 + (doc_id % {_media.VFP_GROUPS}) % 11 AS h
              FROM documents
            ), pos AS (
              SELECT doc_id, g, kf, w,
                     ys.y * 8 + xs.x AS idx,
                     (ys.y * h) // 8 AS r,
                     (xs.x * w) // 9 AS c1,
                     ((xs.x + 1) * w) // 9 AS c2
              FROM p, range(8) ys(y), range(8) xs(x)
            ), bits AS (
              SELECT doc_id, idx,
                     (( (11*g + 19*kf + (3 + 2*g)*r + (5 + g)*c1) % 256
                        + 200 * ((r*w + c1 + doc_id) % 89 = 0)::INT ) % 256
                      <
                      ( (11*g + 19*kf + (3 + 2*g)*r + (5 + g)*c2) % 256
                        + 200 * ((r*w + c2 + doc_id) % 89 = 0)::INT ) % 256
                     )::INT AS bit
              FROM pos
            ), hashes AS (
              SELECT doc_id,
                     SUM(bit * (1::HUGEINT << idx))::UBIGINT AS hu
              FROM bits GROUP BY doc_id
            )""",
            "vhash_hex",
        ),
        # X71 audio fingerprint: window energies recomputed analytically
        # from the planted waveform closed form (media.py: synth_afp_audio /
        # afp64 — sample t's window is (t*65)//n, the assignment form, so
        # the SQL inverts it exactly); brute-force pairs at hamming <= 3
        # check the RIFF decode path AND the band join's structural recall.
        "audio_fingerprint_dedup": _perceptual_oracle(
            f"""p AS (
              SELECT doc_id, doc_id % {_media.AFP_GROUPS} AS g,
                     260 + (doc_id % {_media.AFP_GROUPS}) * 16 AS n
              FROM documents
            ), tt AS (
              SELECT doc_id, g, n, unnest(generate_series(0, n - 1)) AS t
              FROM p
            ), samp AS (
              SELECT doc_id, (t * {_media.AFP_WINDOWS}) // n AS win,
                     abs( (37*g + (5 + 2*g)*t) % 4096 - 2048
                          + CASE WHEN t = doc_id % n THEN 800 ELSE 0 END
                        ) AS amp
              FROM tt
            ), e AS (
              SELECT doc_id, win, SUM(amp)::BIGINT AS energy
              FROM samp GROUP BY doc_id, win
            ), bits AS (
              SELECT a.doc_id, a.win AS idx, (b.energy > a.energy)::INT AS bit
              FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.win = a.win + 1
            ), hashes AS (
              SELECT doc_id,
                     SUM(bit * (1::HUGEINT << idx))::UBIGINT AS hu
              FROM bits GROUP BY doc_id
            )""",
            "afp_hex",
        ),
        # X68 sequence packing: the oracle is the NAIVE global window cumsum
        # the two-phase distributed prefix sum must reproduce exactly —
        # bucket-boundary bookkeeping errors show up as value mismatches.
        "sequence_packing": f"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
                       AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                     (SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - n_tokens)::BIGINT AS tok_start
              FROM t
            )
            SELECT doc_id, n_tokens, tok_start,
                   (tok_start // {Q.SEQ_BUDGET})::BIGINT AS seq_first,
                   ((tok_start + n_tokens - 1) // {Q.SEQ_BUDGET})::BIGINT
                     AS seq_last,
                   ((tok_start + n_tokens - 1) // {Q.SEQ_BUDGET}
                    - tok_start // {Q.SEQ_BUDGET} + 1)::BIGINT AS n_seqs
            FROM c ORDER BY doc_id
        """,
        # X72 training order: the Lehmer mix is chosen precisely so DuckDB
        # computes the identical permutation in exact BIGINT arithmetic
        # (collisions broken by doc_id on both sides).
        "training_order": f"""
            WITH e AS (
              SELECT doc_id,
                     unnest(generate_series(0, {Q.TRAIN_EPOCHS} - 1)) AS epoch
              FROM documents
            ), h AS (
              SELECT doc_id, epoch,
                     ((doc_id % {Q.TRAIN_ORDER_MOD}) * {Q.TRAIN_ORDER_MULT}
                      + 12345 * (epoch + 1)) % {Q.TRAIN_ORDER_MOD} AS hv
              FROM e
            )
            SELECT epoch::BIGINT AS epoch, doc_id,
                   (hv % {Q.TRAIN_SHARDS})::BIGINT AS shard,
                   (ROW_NUMBER() OVER (
                      PARTITION BY epoch, hv % {Q.TRAIN_SHARDS}
                      ORDER BY hv, doc_id))::BIGINT AS pos
            FROM h ORDER BY epoch, shard, pos
        """,
        # X69 mixture weights: integer aggregates are exact; sqrt is IEEE-
        # correctly-rounded on both engines; the cross-source sqrt sum's
        # order noise (~1e-15 rel) is smothered by 6/4 dp rounding (same
        # argument as zipf_fit). Expression order mirrors the Spark plan.
        "mixture_weights": f"""
            WITH per AS (
              SELECT source, COUNT(*)::BIGINT AS n_docs,
                     SUM(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT
                       AS n_tokens
              FROM documents GROUP BY source
            ), tot AS (
              SELECT SUM(n_tokens)::BIGINT AS tot_tokens,
                     SUM(sqrt(n_tokens::DOUBLE))::DOUBLE AS tot_w
              FROM per
            )
            SELECT source, n_docs, n_tokens,
                   round(n_tokens::DOUBLE / tot_tokens, 6) AS token_share,
                   round(sqrt(n_tokens::DOUBLE) / tot_w, 6) AS weight,
                   round(sqrt(n_tokens::DOUBLE) / tot_w
                         * {float(Q.MIX_TARGET_TOKENS)} / n_tokens, 4)
                     AS epochs_at_10m
            FROM per, tot ORDER BY source
        """,
        # X74 repo-level near-dup: brute-force all-pairs vocabulary Jaccard.
        # Valid as an oracle for the Spark LSH path because banding recall
        # at j >= threshold is 1.0 (queries.py REPO_DEDUP_THRESHOLD note)
        # and the Spark side filters on the SAME exact jaccard. Threshold
        # interpolated from the one constant the Spark side uses, so the
        # SPARK_GRAFT_REPO_DEDUP_T override cannot desync the two engines.
        "repo_signature_dedup": f"""
            WITH t AS (
              SELECT source,
                     unnest(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS term
              FROM documents
            ), v AS (
              SELECT DISTINCT source, term FROM t
            ), c AS (
              SELECT source, count(*) AS n FROM v GROUP BY source
            ), sh AS (
              SELECT a.source AS a_source, b.source AS b_source,
                     count(*) AS n_shared
              FROM v a JOIN v b USING (term)
              WHERE a.source < b.source
              GROUP BY a.source, b.source
            )
            SELECT sh.a_source, sh.b_source,
                   sh.n_shared::BIGINT AS n_shared,
                   ca.n::BIGINT AS n_a_terms,
                   cb.n::BIGINT AS n_b_terms,
                   sh.n_shared::DOUBLE / (ca.n + cb.n - sh.n_shared) AS jaccard
            FROM sh
            JOIN c ca ON ca.source = sh.a_source
            JOIN c cb ON cb.source = sh.b_source
            WHERE sh.n_shared::DOUBLE / (ca.n + cb.n - sh.n_shared)
                    >= {Q.REPO_DEDUP_THRESHOLD}
        """,
        # X75 novelty: same span builder as boilerplate_spans but 13-wide
        # (width interpolated from Q.NOVELTY_N), min-attributed to the first
        # doc_id. int/int divisions only — doubles are engine-exact.
        "novelty_scores": f"""
            WITH tw AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[0-9A-Za-z_]+') AS w
              FROM documents
            ), s AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(w) < {Q.NOVELTY_N}
                          THEN [array_to_string(w, ' ')]
                          ELSE list_distinct(list_transform(
                               generate_series(1, len(w)-{Q.NOVELTY_N - 1}),
                               i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(Q.NOVELTY_N))}))
                          END) AS span
              FROM tw
            ), f AS (
              SELECT span, min(doc_id) AS first_doc FROM s GROUP BY span
            )
            SELECT s.doc_id,
                   count(*)::BIGINT AS n_spans,
                   sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT
                     AS n_novel,
                   sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::DOUBLE
                     / count(*) AS novelty
            FROM s JOIN f USING (span)
            GROUP BY s.doc_id
        """,
        # X77 contamination matrix: composed over the near-dup pair oracle
        # with the (doc_id, source) projection joined on both endpoints;
        # least/greatest normalization and order-independent min/max keep
        # every column engine-exact.
        "cross_source_dup_matrix": f"""
            WITH p AS ({_NEAR_DUP_PAIRS_SQL}),
            j AS (
              SELECT least(da.source, db.source) AS a_source,
                     greatest(da.source, db.source) AS b_source,
                     p.jaccard
              FROM p
              JOIN documents da ON da.doc_id = p.a_id
              JOIN documents db ON db.doc_id = p.b_id
            )
            SELECT a_source, b_source,
                   count(*)::BIGINT AS n_pairs,
                   min(jaccard) AS min_jaccard,
                   max(jaccard) AS max_jaccard
            FROM j GROUP BY a_source, b_source
        """,
        # X76 locality card: composed over the near-dup pair oracle; digit
        # binning and min/max keep every output column engine-exact (the
        # jaccard doubles are the same values near_dup_pairs already pins).
        "dedup_locality": f"""
            WITH p AS ({_NEAR_DUP_PAIRS_SQL}),
            d AS (SELECT b_id - a_id AS dist, jaccard FROM p)
            SELECT length(dist::VARCHAR)::BIGINT AS dist_digits,
                   count(*)::BIGINT AS n_pairs,
                   min(dist)::BIGINT AS min_dist,
                   max(dist)::BIGINT AS max_dist,
                   min(jaccard) AS min_jaccard,
                   max(jaccard) AS max_jaccard
            FROM d GROUP BY length(dist::VARCHAR)
        """,
        # X79: the normalization chains are rendered into this SQL from the
        # SAME (pattern, replacement) lists the Spark query compiles
        # (operators/clones.py) — the two engines cannot desync on pattern
        # text; equality of the sha256 keys proves the rendered regex
        # semantics agree byte-for-byte.
        "normalized_clones": f"""
            WITH k AS (
              SELECT doc_id,
                     sha256({_clones.duckdb_expr("text", _clones.TYPE1_CHAIN)}) AS t1_sha,
                     sha256({_clones.duckdb_expr("text", _clones.TYPE2_CHAIN)}) AS t2_sha
              FROM documents
            )
            SELECT doc_id, t1_sha, t2_sha,
                   count(*) OVER (PARTITION BY t1_sha)::BIGINT AS t1_size,
                   count(*) OVER (PARTITION BY t2_sha)::BIGINT AS t2_size
            FROM k
        """,
        "clone_forks": f"""
            WITH k AS (
              SELECT doc_id,
                     sha256({_clones.duckdb_expr("text", _clones.TYPE1_CHAIN)}) AS t1_sha,
                     sha256({_clones.duckdb_expr("text", _clones.TYPE2_CHAIN)}) AS t2_sha,
                     sha256(text) AS raw_sha
              FROM documents
            )
            SELECT t2_sha AS cluster_sha,
                   count(*)::BIGINT AS n_docs,
                   count(DISTINCT t1_sha)::BIGINT AS n_layout_variants,
                   count(DISTINCT raw_sha)::BIGINT AS n_raw_variants,
                   min(doc_id)::BIGINT AS rep_doc_id
            FROM k GROUP BY t2_sha
            HAVING count(*) >= 2
        """,
    }
