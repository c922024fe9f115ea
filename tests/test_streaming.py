"""Structured Streaming: incremental signatures match batch kernel output;
incremental dedup finds cross-batch near-dup pairs exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from minhash_spark.config import MinHashConfig
from minhash_spark.streaming.incremental import (
    run_incremental_dedup,
    run_incremental_signatures,
)

CFG = MinHashConfig(
    seed=1000,
    size=32,
    bit=2,
    tokenizer="word",
    num_bands=8,
    rows_per_band=4,
    verify_threshold=0.9,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_incremental_signatures_match_golden(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_batch(spark, inp, [("r", "p1", "c", "txt", "test 1")])
    run_incremental_signatures(spark, inp, out, ckpt, CFG)
    _write_batch(spark, inp, [("r", "p2", "c", "txt", "test 2")])
    run_incremental_signatures(spark, inp, out, ckpt, CFG)

    got = {r["path"]: r["sig_b64"] for r in spark.read.parquet(out).collect()}
    # golden vectors for analyzer3 config (MinHashPluginTest.java:164,167)
    assert got == {"p1": "W51pEPuK8tw=", "p2": "i11gJHsY/zw="}


def test_incremental_dedup_cross_batch_pairs(spark, tmp_path):
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = text_a  # identical -> J=1 cross-batch pair
    text_c = "completely different words nothing shared here at all ok"
    _write_batch(spark, inp, [("r", "a", "c", "txt", text_a), ("r", "c", "c", "txt", text_c)])
    run_incremental_dedup(spark, inp, state, ckpt, CFG)
    _write_batch(spark, inp, [("r", "b", "c", "txt", text_b)])
    run_incremental_dedup(spark, inp, state, ckpt, CFG)

    edges = spark.read.parquet(os.path.join(state, "edges")).collect()
    assert len(edges) == 1
    assert edges[0]["jaccard"] == 1.0
    sigs = spark.read.parquet(os.path.join(state, "signatures"))
    assert sigs.count() == 3

    # idempotent drain: nothing new -> no new edges
    run_incremental_dedup(spark, inp, state, ckpt, CFG)
    assert spark.read.parquet(os.path.join(state, "edges")).count() == 1


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Watermark contract: after the stream drains, emitted rows equal the
    batch q_event_windowed_counts restricted to windows closed by the
    watermark (end <= max ts seen at the previous batch - 2h)."""
    from minhash_spark.plans import queries as Q
    from minhash_spark.streaming.windows import run_windowed_counts

    sf = "/root/testdata/sf0.001"
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    ev = spark.read.parquet(f"{sf}/events.parquet")
    epoch = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    lo, hi = ev.agg(F.min(epoch), F.max(epoch)).first()
    split = lo + int((hi - lo) * 0.8)

    part_a = ev.where(epoch <= split)
    part_b = ev.where(epoch > split)
    max_b = hi

    part_a.coalesce(1).write.mode("append").parquet(inp)
    run_windowed_counts(spark, inp, out, ckpt)  # run 1: watermark still epoch 0
    part_b.coalesce(1).write.mode("append").parquet(inp)
    run_windowed_counts(spark, inp, out, ckpt)  # run 2: watermark = max(A) - 2h
    # sentinel far past the end so run 3's watermark closes every real window
    spark.createDataFrame(
        [(10**9, "sentinel", 0.0, "{}")], "user_id long, event_type string, value double, props string"
    ).withColumn("event_id", F.lit(10**9)).withColumn(
        "ts", F.expr(f"TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_interval(0,0,0,0,0,0,{max_b + 4 * 3600})")
    ).select("event_id", "ts", "user_id", "event_type", "value", "props").coalesce(
        1
    ).write.mode("append").parquet(inp)
    run_windowed_counts(spark, inp, out, ckpt)  # run 3: watermark = max(B) - 2h
    run_windowed_counts(spark, inp, out, ckpt)  # run 4: watermark = sentinel - 2h

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "sentinel"
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in Q.q_event_windowed_counts(spark, sf).collect()
    }
    assert got == want
    # each real window emitted exactly once across the four restarts; the
    # sentinel's own window stays open (watermark never passes it), so the
    # sink holds exactly the real windows
    assert len(spark.read.parquet(out).collect()) == len(got)


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Closed-session stream (applyInPandasWithState, event-time timeout)
    equals the batch sessionization once a sentinel advances the watermark
    past every real session's gap deadline."""
    from minhash_spark.plans import queries as Q
    from minhash_spark.streaming.sessions import run_streaming_sessions

    sf = "/root/testdata/sf0.001"
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    ev = spark.read.parquet(f"{sf}/events.parquet")
    epoch = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    lo, hi = ev.agg(F.min(epoch), F.max(epoch)).first()
    split = lo + int((hi - lo) * 0.6)

    ev.where(epoch <= split).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_sessions(spark, inp, out, ckpt)
    ev.where(epoch > split).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_sessions(spark, inp, out, ckpt)
    # sentinel user far in the future: watermark passes every gap deadline
    spark.createDataFrame(
        [(10**9, 10**9, "sentinel", 0.0, "{}")],
        "event_id long, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts",
        F.expr(
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_interval(0,0,0,0,0,0,{hi + 10 * 3600})"
        ),
    ).select("event_id", "ts", "user_id", "event_type", "value", "props").coalesce(
        1
    ).write.mode("append").parquet(inp)
    run_streaming_sessions(spark, inp, out, ckpt)
    run_streaming_sessions(spark, inp, out, ckpt)  # fire the timeouts

    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["start_epoch"], r["end_epoch"], r["duration_s"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != 10**9
    }
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["start_epoch"], r["end_epoch"], r["duration_s"])
        for r in Q.q_event_sessions(spark, sf).collect()
    }
    assert got == want


def test_incremental_clusters_merge_across_batches(spark, tmp_path):
    """a~b arrive in separate batches, then c (similar to b) closes a chain:
    the maintained clusters table must merge all three into ONE cluster."""
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "entirely different content with zero overlap whatsoever here"
    _write_batch(spark, inp, [("r", "a", "c", "txt", base), ("r", "x", "c", "txt", other)])
    run_incremental_dedup(spark, inp, state, ckpt, CFG, maintain_clusters=True)
    c1 = {r["rep_id"]: r["cluster_id"] for r in
          spark.read.parquet(os.path.join(state, "clusters")).collect()}
    assert len(set(c1.values())) == 2  # a and x, no merge yet

    _write_batch(spark, inp, [("r", "b", "c", "txt", base)])
    run_incremental_dedup(spark, inp, state, ckpt, CFG, maintain_clusters=True)
    _write_batch(spark, inp, [("r", "c2", "c", "txt", base)])
    run_incremental_dedup(spark, inp, state, ckpt, CFG, maintain_clusters=True)

    rows = spark.read.parquet(os.path.join(state, "clusters")).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["rep_id"])
    assert len(rows) == 4
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [1, 3]  # {x} and {a, b, c2} merged across three batches


def test_streaming_clusters_equal_batch_pipeline(spark, tmp_path):
    """The incremental path split across two micro-batches must produce the
    SAME cluster partition as the batch pipeline on the same corpus (cluster
    ids may differ; the partition of files into groups may not)."""
    import minhash_spark as m
    from minhash_spark.sources.fixtures import corpus_b

    files, _, _ = corpus_b(n_clusters=8, n_singletons=15, seed=11)
    df = spark.createDataFrame(files)
    cfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="char_shingle",
                        tokenizer_params={"k": 9}, verify_threshold=0.8)

    batch_out = m.DedupPipeline(spark, m.TableIO(str(tmp_path / "b")), cfg).run(df)
    batch = {}
    for r in batch_out.collect():
        batch.setdefault(r["cluster_id"], set()).add(r["file_id"])

    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    df.where("hash(path) % 2 = 0").coalesce(1).write.mode("append").parquet(inp)
    run_incremental_dedup(spark, inp, state, ckpt, cfg, maintain_clusters=True)
    df.where("hash(path) % 2 != 0").coalesce(1).write.mode("append").parquet(inp)
    run_incremental_dedup(spark, inp, state, ckpt, cfg, maintain_clusters=True)
    stream = {}
    for r in spark.read.parquet(os.path.join(state, "clusters")).collect():
        stream.setdefault(r["cluster_id"], set()).add(r["rep_id"])

    batch_partition = {frozenset(v) for v in batch.values()}
    stream_partition = {frozenset(v) for v in stream.values()}
    assert batch_partition == stream_partition


def test_incremental_dedup_with_curation(spark, tmp_path):
    """curate=True applies the batch pipeline's filter + redaction per
    micro-batch: autogen files never enter state; secrets are redacted
    BEFORE hashing so content_sha256 matches the redacted content (batch and
    stream state stay signature-compatible)."""
    import hashlib

    inp, state, ckpt = (str(tmp_path / d) for d in ("cin", "cstate", "cckpt"))
    body = "\n".join(
        " ".join(f"word{i+j}" for j in range(5)) for i in range(0, 30, 5)
    )
    _write_batch(
        spark,
        inp,
        [
            ("r", "ok.py", "c", "py", body),
            ("r", "gen.py", "c", "py", "# generated by tool\n" + body),
            ("r", "sec.py", "c", "py", "email bob@example.com\n" + body),
        ],
    )
    run_incremental_dedup(spark, inp, state, ckpt, CFG, curate=True)
    sigs = spark.read.parquet(os.path.join(state, "signatures")).collect()
    paths = {r["content"][:20]: r for r in sigs}
    assert len(sigs) == 2  # gen.py filtered out
    redacted = next(r for r in sigs if "<EMAIL>" in r["content"])
    assert "bob@example.com" not in redacted["content"]
    assert (
        redacted["content_sha256"]
        == hashlib.sha256(redacted["content"].encode()).hexdigest()
    )
    # the redacted doc's signature equals the batch kernel's signature of the
    # redacted text (stream state interoperates with batch state)
    from minhash_spark.functions.udfs import minhash_struct_udf

    sig = minhash_struct_udf(CFG)
    batch_sig = (
        spark.createDataFrame([(redacted["content"],)], "content string")
        .select(sig(F.col("content")).alias("s"))
        .select("s.sig")
        .first()["sig"]
    )
    assert bytes(redacted["sig"]) == bytes(batch_sig)


def test_incremental_signatures_license_gate(spark, tmp_path):
    """license_allow applies the batch pipeline's license gate per
    micro-batch: GPL-marked files never enter streamed state, matching what
    jobs/curate.py --license-allow keeps in batch."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("lin", "lout", "lckpt"))
    body = "\n".join(f"line {i} alpha beta" for i in range(10))
    _write_batch(
        spark,
        inp,
        [
            ("r", "mit.py", "c", "py", "# SPDX-License-Identifier: MIT\n" + body),
            ("r", "gpl.py", "c", "py",
             "# under the GNU General Public License\n" + body),
            ("r", "plain.py", "c", "py", body),
        ],
    )
    run_incremental_signatures(
        spark, inp, out, ckpt, CFG,
        license_allow=["mit", "apache", "bsd", "unknown"],
    )
    paths = {r["path"] for r in spark.read.parquet(out).collect()}
    assert paths == {"mit.py", "plain.py"}


def test_incremental_star_anchors_on_history_min(spark, tmp_path):
    """ADVICE r2: in an OVERSIZED bucket, if a newly arrived doc displaces
    the bucket minimum, the star must still anchor on the HISTORY-side
    minimum — otherwise the new doc pairs with nothing (it would be its own
    anchor) and the new-vs-history edge is permanently lost."""
    import hashlib

    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    cfg = MinHashConfig(
        seed=1000, size=32, bit=2, tokenizer="word",
        num_bands=8, rows_per_band=4, verify_threshold=0.9,
        max_bucket_size=4,  # 6 history + 1 new identical docs -> oversized
    )
    fid = lambda p: hashlib.sha256(f"r{p}c".encode()).hexdigest()  # noqa: E731
    cands = sorted((fid(f"p{i}"), f"p{i}") for i in range(200))
    new_path = cands[0][1]           # smallest file_id -> displaces the min
    hist_paths = [p for _, p in cands[-6:]]  # history = the 6 largest
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    _write_batch(spark, inp, [("r", p, "c", "txt", text) for p in hist_paths])
    run_incremental_dedup(spark, inp, state, ckpt, cfg, maintain_clusters=True)
    _write_batch(spark, inp, [("r", new_path, "c", "txt", text)])
    run_incremental_dedup(spark, inp, state, ckpt, cfg, maintain_clusters=True)

    new_id = fid(new_path)
    hist_ids = {fid(p) for p in hist_paths}
    edges = spark.read.parquet(os.path.join(state, "edges")).select("a_id", "b_id").collect()
    touching_new = {
        (r["a_id"], r["b_id"]) for r in edges if new_id in (r["a_id"], r["b_id"])
    }
    assert touching_new, "new doc must gain an edge despite being the bucket min"
    assert any(
        a in hist_ids or b in hist_ids for a, b in touching_new
    ), "the new doc's star edge must reach a HISTORY member"
    clusters = spark.read.parquet(os.path.join(state, "clusters"))
    assert clusters.select("cluster_id").distinct().count() == 1
    assert clusters.count() == 7


def test_history_probe_gateway_less_fallback(tmp_path):
    """Spark Connect sessions have no py4j gateway (ADVICE r3): the history
    probe must fall back to a local-filesystem listing for local paths and
    fail LOUDLY (not 'no history') for remote schemes it cannot probe."""
    import pytest as _pytest

    from minhash_spark.streaming.incremental import _history_partitions_exist

    class _NoJvmSession:  # simulates a Connect session: no _jvm attribute
        pass

    s = _NoJvmSession()
    missing = str(tmp_path / "absent")
    assert _history_partitions_exist(s, missing) is False
    d = tmp_path / "sigs"
    d.mkdir()
    assert _history_partitions_exist(s, str(d)) is False  # no partitions yet
    (d / "batch_id=0").mkdir()
    assert _history_partitions_exist(s, str(d)) is True
    assert _history_partitions_exist(s, f"file://{d}") is True
    with _pytest.raises(RuntimeError, match="JVM gateway"):
        _history_partitions_exist(s, "s3a://bucket/sigs")


def test_streaming_embedding_dedup_matches_batch(spark, tmp_path):
    """Continuous-SemDeDup twin: cross-batch streamed edges and clusters must
    equal the batch operator's output on the same planted vectors (same
    hyperplane family, same exact-cosine verify, shared history-anchored
    candidate topology)."""
    import numpy as np

    from minhash_spark.plans import queries as Q
    from minhash_spark.streaming.embeddings import run_incremental_embedding_dedup

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _c in range(5):  # 5 planted clusters of 3 near-identical vectors
        base = rng.standard_normal(64)
        for _j in range(3):
            v = base + 0.01 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _s in range(20):  # noise singletons (random cos ~ N(0, 1/64) << tau)
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    batch_dir = str(tmp_path / "emb_batch")
    df.write.parquet(f"{batch_dir}/embeddings.parquet")
    batch_pairs = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in Q.q_embedding_near_dup_pairs(spark, batch_dir).collect()
    }
    assert len(batch_pairs) >= 5 * 3  # every planted cluster fully paired

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing, exist_ok=True)
    # interleaved split so every planted cluster straddles the two batches —
    # cross-batch (new x history) edges are the path under test
    df.where(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("append").parquet(landing)
    run_incremental_embedding_dedup(spark, landing, state, ckpt, maintain_clusters=True)
    df.where(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(landing)
    run_incremental_embedding_dedup(spark, landing, state, ckpt, maintain_clusters=True)

    streamed = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in spark.read.parquet(f"{state}/edges")
        .select("a_id", "b_id", "cos_sim")
        .collect()
    }
    assert streamed == batch_pairs

    stream_clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in spark.read.parquet(f"{state}/clusters").collect()
    }
    batch_clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in Q.q_embedding_near_dup_clusters(spark, batch_dir).collect()
    }
    assert stream_clusters == batch_clusters


def test_repo_state_stream_matches_batch_and_replay(spark, tmp_path):
    """X78 streaming repo sketches: after two drained drops the state equals
    a batch merge_minima over ALL files (the monoid says it must); folding
    the same batch twice (at-least-once replay) changes nothing."""
    from minhash_spark.operators.repo import merge_minima
    from minhash_spark.streaming.collections import (
        repo_signatures,
        run_repo_signature_stream,
        update_repo_state,
    )

    rcfg = MinHashConfig(seed=0, size=128, bit=1, tokenizer="word")
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    b1 = [
        ("ra", "f1", "c", "py", "alpha beta gamma"),
        ("rb", "f1", "c", "py", "delta epsilon"),
    ]
    b2 = [
        ("ra", "f2", "c", "py", "gamma zeta"),
        ("rc", "f1", "c", "py", "eta theta iota"),
    ]
    _write_batch(spark, inp, b1)
    run_repo_signature_stream(spark, inp, state, ckpt, rcfg)
    _write_batch(spark, inp, b2)
    run_repo_signature_stream(spark, inp, state, ckpt, rcfg)

    got = {r["repo"]: list(r["mins"]) for r in repo_signatures(spark, state).collect()}

    from minhash_spark.functions.udfs import minhash_mins_udf

    all_files = spark.createDataFrame(
        b1 + b2,
        "repo string, path string, commit string, lang string, content string",
    )
    mins = minhash_mins_udf(rcfg)
    want = {
        r["repo"]: list(r["mins"])
        for r in merge_minima(
            all_files.select("repo", mins(F.col("content")).alias("mins")), "repo"
        ).collect()
    }
    assert got == want

    # at-least-once replay: re-fold batch 2 directly — state unchanged
    update_repo_state(
        spark,
        spark.createDataFrame(
            b2, "repo string, path string, commit string, lang string, content string"
        ),
        state,
        rcfg,
    )
    again = {r["repo"]: list(r["mins"]) for r in repo_signatures(spark, state).collect()}
    assert again == want

    # idempotent drain: nothing new in the landing dir -> state unchanged
    run_repo_signature_stream(spark, inp, state, ckpt, rcfg)
    assert {
        r["repo"]: list(r["mins"]) for r in repo_signatures(spark, state).collect()
    } == want
