"""Snapshot carry-forward in the batch pipeline (plans/pipeline.py): signing
snapshot N+1 with --prev-checkpoints must be bit-identical to a full
recompute, while the kernel runs only on the content delta."""

from __future__ import annotations

import hashlib

import pytest

from minhash_spark.config import MinHashConfig
from minhash_spark.plans.pipeline import DedupPipeline
from minhash_spark.sources.io import TableIO
from tests.test_history import _snapshots

CFG = MinHashConfig(
    seed=0,
    size=128,
    bit=1,
    tokenizer="char_shingle",
    tokenizer_params={"k": 9},
    num_bands=32,
    rows_per_band=4,
    verify_threshold=0.8,
)


@pytest.fixture(scope="module")
def snap_dfs(spark):
    snap1, snap2 = _snapshots()
    cols = ["repo", "path", "commit", "lang", "content"]
    df1 = spark.createDataFrame([[r[c] for c in cols] for r in snap1], cols)
    df2 = spark.createDataFrame([[r[c] for c in cols] for r in snap2], cols)
    return snap1, snap2, df1, df2


def test_snapshot_carry_forward_bit_identical(spark, snap_dfs, tmp_path):
    snap1, snap2, df1, df2 = snap_dfs
    # snapshot 1: full run
    pipe1 = DedupPipeline(spark, TableIO(str(tmp_path / "day1")), CFG)
    pipe1.run(df1)
    prev_sigs = TableIO(str(tmp_path / "day1")).read(spark, DedupPipeline.T_SIG)
    # snapshot 2, incremental vs full
    io_inc = TableIO(str(tmp_path / "day2_inc"))
    io_full = TableIO(str(tmp_path / "day2_full"))
    out_inc = DedupPipeline(spark, io_inc, CFG).run(
        df2,
        prev_signatures=prev_sigs,
        prev_signature_hash=TableIO(str(tmp_path / "day1"))
        .manifest(DedupPipeline.T_SIG)["metrics"]["signature_hash"],
    )
    out_full = DedupPipeline(spark, io_full, CFG).run(df2)

    def sig_map(io):
        return {
            r["content_sha256"]: (bytes(r["sig"]), r["sig_b64"], tuple(r["bands"]))
            for r in io.read(spark, DedupPipeline.T_SIG).collect()
        }

    assert sig_map(io_inc) == sig_map(io_full)

    def clusters(df):
        return {r["file_id"]: r["cluster_id"] for r in df.collect()}

    assert clusters(out_inc) == clusters(out_full)
    # manifest observability: the kernel ran only on the true content delta
    shas1 = {hashlib.sha256(r["content"].encode()).hexdigest() for r in snap1}
    shas2 = {hashlib.sha256(r["content"].encode()).hexdigest() for r in snap2}
    m = io_inc.manifest(DedupPipeline.T_SIG)
    assert m["metrics"]["computed_fresh_contents"] == len(shas2 - shas1)
    assert 0 < len(shas2 - shas1) < len(shas2)


def test_snapshot_carry_forward_refuses_common_shingle_filter(spark, snap_dfs, tmp_path):
    _, _, df1, df2 = snap_dfs
    cfg = MinHashConfig(
        seed=0,
        size=128,
        bit=1,
        tokenizer="char_shingle",
        tokenizer_params={"k": 9},
        num_bands=32,
        rows_per_band=4,
        filter_common_shingles=True,
    )
    pipe = DedupPipeline(spark, TableIO(str(tmp_path / "x")), cfg)
    with pytest.raises(ValueError, match="filter_common_shingles"):
        pipe.run(df2, prev_signatures=df1.limit(0))


def test_carry_forward_refuses_mismatched_signature_config(spark, snap_dfs, tmp_path):
    """ADVICE r4: the config-identity gate must live at the pipeline API
    boundary, not only in the dedup CLI — a programmatic caller passing a
    signatures table computed under a different kernel/banding config must
    get a hard error, not silently non-bit-exact carry-forward."""
    _, _, df1, df2 = snap_dfs
    other = MinHashConfig(
        seed=1,  # different hash family -> different signature_hash
        size=128,
        bit=1,
        tokenizer="char_shingle",
        tokenizer_params={"k": 9},
        num_bands=32,
        rows_per_band=4,
    )
    pipe = DedupPipeline(spark, TableIO(str(tmp_path / "y")), CFG)
    with pytest.raises(ValueError, match="different signature config"):
        pipe.run(
            df2,
            prev_signatures=df1.limit(0),
            prev_signature_hash=other.signature_hash(),
        )
