"""Training-shard sink: materialize a (deduplicated) corpus as N balanced,
deterministic shards for downstream training-data loaders.

Shard assignment is a pure function of the row id (``pmod(xxhash64(id), N)``)
— independent of partitioning, row order, and cluster size, so a re-run (or
a different cluster) produces byte-stable shard membership; training jobs
can then read `shard=K` directories independently with no coordination.
The write is one hash-partitioned exchange (the only shuffle), and the
manifest records per-shard rows/bytes plus balance stats, same contract as
the pipeline stage manifests (sources/io.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` as ``path/shard=K/*.parquet`` for K in [0, n_shards);
    returns the manifest (also persisted at ``path/_manifest.json``).

    ``repartition(n_shards, shard)`` aligns output files with shard
    directories — one exchange, one file per shard (plus Spark's own
    max-records splits at extreme sizes)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    t0 = time.time()
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    from minhash_spark.sources.io import _parquet_partition_stats

    shards = []
    for k in range(n_shards):
        d = os.path.join(path, f"shard={k}")
        rows, parts, _stats = (
            _parquet_partition_stats(d) if os.path.isdir(d) else (0, [], {})
        )
        shards.append(
            {"shard": k, "rows": rows, "bytes": sum(p["bytes"] for p in parts)}
        )
    total = sum(s["rows"] for s in shards)
    mean = total / n_shards if n_shards else 0.0
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "rows": total,
        "shards": shards,
        "balance": {
            "min_rows": min(s["rows"] for s in shards),
            "max_rows": max(s["rows"] for s in shards),
            "mean_rows": round(mean, 1),
            "skew_max_over_mean": round(max(s["rows"] for s in shards) / mean, 3)
            if mean
            else 0.0,
        },
        "wall_s": round(time.time() - t0, 3),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
