"""SparkSession builder with the engine's tuned defaults.

Tuning rationale (local[32] sandbox standing in for a 1000-executor cluster):
  * AQE on — runtime shuffle-partition coalescing + skew-join splitting;
  * Arrow on — every kernel UDF is Arrow-vectorized (no per-row Python);
  * maxRecordsPerBatch sized so the kernel's (tokens x seeds) NumPy arrays
    stay under the glibc mmap threshold (sandbox page faults are ~36 MB/s on
    fresh mmaps; MALLOC_* env vars keep the worker heap reused);
  * shuffle partitions default to 2x cores locally; on a real cluster this is
    set to ~2-3x total executor cores by the submitter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "67108864",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def tune_malloc_env() -> None:
    """Set glibc malloc env vars in THIS process (driver / bench / pytest).
    Must run before heavy NumPy allocation; inherited by forked pyspark
    workers on the driver node."""
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)


def build_session(
    app_name: str = "minhash-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    tune_malloc_env()
    cpus = os.cpu_count() or 8
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', cpus)}]")
    if shuffle_partitions is None:
        # 2x parallelism: AQE coalesces down, skew splits up
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = 2 * (cpus if inner == "*" else int(inner))
        else:  # pragma: no cover - real cluster
            shuffle_partitions = 256
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        # Scan-split sizing for CPU-dense per-byte work (sha256 / kernel /
        # decode UDFs fused into scans): the default 128 MB splits + 4 MB
        # open cost pack this engine's ~1 MB stage files into a handful of
        # scan tasks, serializing work that should fan out (guide §2.5
        # "input skew"). Parameterized for cluster submitters — plain
        # sequential-scan ETL at 100 TB wants these LARGER (guide §6), but
        # every scan here feeds hash/kernel-dense maps where ~4 MB of input
        # is already >100 ms of CPU per task.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "1m"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
