"""minhash-spark: PySpark-native near-duplicate detection & clustering.

Public surface (lazy imports so kernel-only users — e.g. jobs/analyze.py —
don't pay the pyspark import):

    from minhash_spark import MinHashConfig          # analyzer/LSH/verify config
    from minhash_spark import DedupPipeline, TableIO # batch pipeline + checkpoints
    from minhash_spark import build_session          # tuned SparkSession
    from minhash_spark import search_signatures      # signature similarity search
    from minhash_spark import signature_for_text     # driver-side query signature
"""

from __future__ import annotations

_EXPORTS = {
    "MinHashConfig": ("minhash_spark.config", "MinHashConfig"),
    "DedupPipeline": ("minhash_spark.plans.pipeline", "DedupPipeline"),
    "TableIO": ("minhash_spark.sources.io", "TableIO"),
    "build_session": ("minhash_spark.session", "build_session"),
    "search_signatures": ("minhash_spark.plans.search", "search_signatures"),
    "signature_for_text": ("minhash_spark.functions.udfs", "signature_for_text"),
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'minhash_spark' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)
