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


MAX_PARTITION_DETAIL = 4096  # per-file rows listed in full up to this many files


def _parquet_partition_stats(path: str) -> tuple[int, list[dict], dict]:
    """Per-partition lineage from parquet footers on the driver (no Spark job
    — stage publishes should not pay a cluster round-trip for bookkeeping).

    Returns (total_rows, partitions, stats): ``partitions`` lists each data
    file's relative path, row count, and byte size (truncated past
    MAX_PARTITION_DETAIL files — the aggregate stats always cover ALL files);
    ``stats`` summarizes the row distribution (count/min/max/mean and
    max/mean skew ratio) so a skewed stage is visible from the manifest alone."""
    import pyarrow.parquet as pq

    parts: list[dict] = []
    rows_per_file: list[int] = []
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            n = pq.ParquetFile(full).metadata.num_rows
            total += n
            rows_per_file.append(n)
            if len(parts) < MAX_PARTITION_DETAIL:
                parts.append(
                    {
                        "file": os.path.relpath(full, path),
                        "rows": n,
                        "bytes": os.stat(full).st_size,
                    }
                )
    n_files = len(rows_per_file)
    mean = total / n_files if n_files else 0.0
    stats = {
        "n_files": n_files,
        "min_rows": min(rows_per_file) if n_files else 0,
        "max_rows": max(rows_per_file) if n_files else 0,
        "mean_rows": round(mean, 1),
        "skew_max_over_mean": round(max(rows_per_file) / mean, 3) if mean else 0.0,
        "detail_truncated": n_files > MAX_PARTITION_DETAIL,
    }
    return total, parts, stats


def _parquet_rows(path: str) -> int:
    total, _parts, _stats = _parquet_partition_stats(path)
    return total


def input_fingerprint(df: DataFrame) -> str | None:
    """Cheap dataset identity for resume gating: sha256 of the sorted
    (path, size, mtime_ns) listing of the DataFrame's backing files. Catches
    added, removed, and rewritten input files without a Spark job — mtime is
    included because a same-length rewrite (regenerated fixed-width fixture)
    leaves (path, size) unchanged. Returns None for non-file-backed
    DataFrames (in-memory test frames) — callers may supply their own
    fingerprint instead."""
    import hashlib
    from urllib.parse import urlparse

    files = sorted(df.inputFiles())
    if not files:
        return None
    h = hashlib.sha256()
    for uri in files:
        p = urlparse(uri)
        path = p.path if p.scheme in ("", "file") else None
        size, mtime = -1, -1
        if path and os.path.exists(path):
            st = os.stat(path)
            size, mtime = st.st_size, st.st_mtime_ns
        h.update(f"{uri}\x00{size}\x00{mtime}\n".encode())
    return h.hexdigest()[:16]


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

    def is_fresh(
        self,
        name: str,
        config_hash: str,
        upstream: list[str],
        input_fp: str | None = None,
    ) -> bool:
        """True iff the stage table exists, was produced under ``config_hash``,
        each upstream manifest's identity hash still matches, AND (for root
        stages) the recorded input fingerprint equals ``input_fp`` — so a
        changed/updated input dataset invalidates the whole chain instead of
        silently resuming stale results."""
        m = self.manifest(name)
        if m is None or m.get("config_hash") != config_hash:
            return False
        if m.get("input_fp") != input_fp:
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
        input_fp: str | None = None,
    ) -> dict:
        """Write-to-temp + atomic rename publish; manifest carries lineage."""
        final = self.path(name)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        t0 = time.time()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        rows, partitions, pstats = _parquet_partition_stats(tmp)
        manifest = {
            "snapshot_id": uuid.uuid4().hex,
            "config_hash": config_hash,
            "input_fp": input_fp,
            "inputs": {up: (self.manifest(up) or {}).get("snapshot_id") for up in upstream},
            "rows": rows,
            "schema": df.schema.simpleString(),
            "wall_s": round(time.time() - t0, 3),
            "written_at": time.time(),
            "metrics": extra_metrics or {},
            "partitions": partitions,
            "partition_stats": pstats,
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        self._publish(tmp, final)
        return manifest

    def _publish(self, tmp: str, final: str) -> None:
        """Atomic last-writer-wins swap, safe under CONCURRENT writers.

        The previous snapshot is renamed ASIDE (atomic) rather than rmtree'd
        in place, so a reader never observes a half-deleted table: at every
        instant ``final`` is either a complete old snapshot, absent for the
        nanoseconds between two renames, or a complete new snapshot. Two
        racing writers both publish a complete snapshot; one of them wins
        (exactly one rename into ``final`` succeeds last), the loser's
        snapshot is retired like any old one. Mirrors an Iceberg
        commit-retry loop at filesystem granularity."""
        import errno

        for _ in range(16):
            try:
                os.rename(tmp, final)
                break
            except OSError as e:
                # ONLY the final-already-exists family is retryable; any
                # other failure (tmp missing, cross-device rename, perms)
                # must propagate WITHOUT touching the live snapshot —
                # retiring `final` on an unrelated error would destroy the
                # previous good table and then fail anyway
                if e.errno not in (errno.EEXIST, errno.ENOTEMPTY, errno.ENOTDIR):
                    raise
                # final exists (or reappeared): retire it aside atomically,
                # then retry; a concurrent writer may have already moved it
                aside = final + ".old-" + uuid.uuid4().hex[:8]
                try:
                    os.rename(final, aside)
                except FileNotFoundError:
                    continue
                shutil.rmtree(aside, ignore_errors=True)
        else:  # pragma: no cover
            raise OSError(f"could not publish {final} after 16 attempts")
        # retire any snapshot a racing writer left aside
        parent = os.path.dirname(final) or "."
        base = os.path.basename(final) + ".old-"
        for e in os.listdir(parent):
            if e.startswith(base):
                shutil.rmtree(os.path.join(parent, e), ignore_errors=True)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
