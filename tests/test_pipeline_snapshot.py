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


def test_edge_carry_forward_clusters_identical(spark, snap_dfs, tmp_path):
    """VERDICT r4 item 7: with BOTH signatures and edges carried from the
    previous snapshot, LSH + verify run only on pairs touching the content
    delta, and day-2 clusters are identical to a full recompute."""
    _, _, df1, df2 = snap_dfs
    io1 = TableIO(str(tmp_path / "e_day1"))
    DedupPipeline(spark, io1, CFG).run(df1)
    prev_sigs = io1.read(spark, DedupPipeline.T_SIG)
    prev_edges = io1.read(spark, DedupPipeline.T_EDGES)
    em = io1.manifest(DedupPipeline.T_EDGES)
    assert em["metrics"]["edge_hash"] == CFG.edge_hash()

    io_inc = TableIO(str(tmp_path / "e_day2_inc"))
    out_inc = DedupPipeline(spark, io_inc, CFG).run(
        df2,
        prev_signatures=prev_sigs,
        prev_signature_hash=CFG.signature_hash(),
        prev_edges=prev_edges,
        prev_edge_hash=CFG.edge_hash(),
    )
    io_full = TableIO(str(tmp_path / "e_day2_full"))
    out_full = DedupPipeline(spark, io_full, CFG).run(df2)

    def edge_set(io):
        return {
            (r["a_id"], r["b_id"], round(r["jaccard"], 12))
            for r in io.read(spark, DedupPipeline.T_EDGES).collect()
        }

    assert edge_set(io_inc) == edge_set(io_full)

    def clusters(df):
        return {r["file_id"]: r["cluster_id"] for r in df.collect()}

    assert clusters(out_inc) == clusters(out_full)
    # observability: most edges carried, not recomputed (corpus_b clusters
    # are size ~6 with ~10% touched content, so the carried share is large)
    m = io_inc.manifest(DedupPipeline.T_EDGES)
    assert m["metrics"]["carried_edges"] > 0
    assert m["metrics"]["carried_edges"] <= len(edge_set(io_full))


def test_edge_carry_forward_requires_matching_edge_hash(spark, snap_dfs, tmp_path):
    """verify_threshold differs -> day-1 edges are NOT comparable; the API
    must refuse even though the signature config matches."""
    _, _, df1, df2 = snap_dfs
    io1 = TableIO(str(tmp_path / "eh_day1"))
    DedupPipeline(spark, io1, CFG).run(df1)
    prev_sigs = io1.read(spark, DedupPipeline.T_SIG)
    prev_edges = io1.read(spark, DedupPipeline.T_EDGES)
    import dataclasses

    looser = dataclasses.replace(CFG, verify_threshold=0.5)
    pipe = DedupPipeline(spark, TableIO(str(tmp_path / "eh_day2")), looser)
    with pytest.raises(ValueError, match="different edge config"):
        pipe.run(
            df2,
            prev_signatures=prev_sigs,
            prev_signature_hash=looser.signature_hash(),
            prev_edges=prev_edges,
            prev_edge_hash=CFG.edge_hash(),
        )
    # and prev_edges without prev_signatures is refused outright
    with pytest.raises(ValueError, match="requires prev_signatures"):
        DedupPipeline(spark, TableIO(str(tmp_path / "eh_day2b")), CFG).run(
            df2, prev_edges=prev_edges, prev_edge_hash=CFG.edge_hash()
        )


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
