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

from minhash_spark.plans import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline (MinHash -> LSH -> exact verify ->
    connected components) on the sf0.001 documents table."""
    return Q.q_near_dup_clusters(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # dedup pipeline operators (SURVEY §2.2-2.3)
        "exact_dup_clusters": Q.q_exact_dup_clusters,
        "exact_dup_pairs": Q.q_exact_dup_pairs,
        "near_dup_pairs": Q.q_near_dup_pairs,
        "near_dup_clusters": Q.q_near_dup_clusters,
        "minhash_signatures": Q.q_minhash_signatures,
        "minhash_collapse": Q.q_minhash_collapse,
        "simhash_near_dup_pairs": Q.q_simhash_near_dup_pairs,
        "char_ngram_dup_pairs": Q.q_char_ngram_dup_pairs,
        # text analytics (training-data pipeline extensions)
        "token_counts": Q.q_token_counts,
        "quality_scores": Q.q_quality_scores,
        "lang_marker_scores": Q.q_lang_marker_scores,
        "doc_fingerprints": Q.q_doc_fingerprints,
        # similarity search over embeddings
        "embedding_topk": Q.q_embedding_topk,
        "embedding_ann_lsh": Q.q_embedding_ann_lsh,
        # multimodal plumbing (stub decoder, real Spark plumbing)
        "multimodal_features": Q.q_multimodal_features,
    }


_NEAR_DUP_PAIRS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
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
        "near_dup_clusters": f"""
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
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
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
        "embedding_topk": """
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
        """,
    }
