"""Checkpointed table IO with manifest-gated resume (SURVEY §2.3 P8).

Iceberg semantics on a no-network sandbox: atomic publish via
write-to-temp-dir + rename, a ``_manifest.json`` per stage recording
(config_hash, input manifest hashes, row count, schema, wall time). A stage
is skipped on rerun iff its manifest matches the requested config and its
upstream manifests — the same contract an Iceberg snapshot chain gives.
When an Iceberg runtime jar is present, ``TableIO`` can be subclassed to
``format("iceberg")`` with no pipeline changes (the seam SURVEY §7.1.3 asks
for).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers on the driver (no Spark job — stage
    publishes should not pay a cluster round-trip for bookkeeping)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class TableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- manifests ----------------------------------------------------------
    def manifest(self, name: str) -> dict | None:
        p = os.path.join(self.path(name), MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_fresh(self, name: str, config_hash: str, upstream: list[str]) -> bool:
        """True iff the stage table exists, was produced under ``config_hash``,
        and each upstream manifest's identity hash still matches."""
        m = self.manifest(name)
        if m is None or m.get("config_hash") != config_hash:
            return False
        for up in upstream:
            um = self.manifest(up)
            if um is None or um.get("snapshot_id") != m.get("inputs", {}).get(up):
                return False
        return True

    # -- write/publish ------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        config_hash: str,
        upstream: list[str] = (),
        partition_by: list[str] | None = None,
        extra_metrics: dict | None = None,
    ) -> dict:
        """Write-to-temp + atomic rename publish; manifest carries lineage."""
        final = self.path(name)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        t0 = time.time()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        rows = _parquet_rows(tmp)
        manifest = {
            "snapshot_id": uuid.uuid4().hex,
            "config_hash": config_hash,
            "inputs": {up: (self.manifest(up) or {}).get("snapshot_id") for up in upstream},
            "rows": rows,
            "schema": df.schema.simpleString(),
            "wall_s": round(time.time() - t0, 3),
            "written_at": time.time(),
            "metrics": extra_metrics or {},
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return manifest

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
