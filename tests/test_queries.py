"""Query-suite tests on the driver tables at sf0.001: ANN recall vs brute
force, fingerprints sanity, multimodal plumbing, signature surface."""

from __future__ import annotations

from minhash_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_embedding_ann_recall_vs_brute(spark):
    brute = Q.q_embedding_topk(spark, SF).collect()
    ann = Q.q_embedding_ann_lsh(spark, SF).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_id"], r["neighbor_id"]) for r in ann}
    # hard recall gate: the multi-table LSH must recover >=90% of the true
    # top-5 pairs (b=4 x L=32 is tuned for this corpus's cosine operating
    # point; measured 1.0 — see q_embedding_ann_lsh docstring)
    assert len(truth) == 50
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"ANN recall {recall} < 0.9"
    # and scores on the overlap must agree exactly with brute force
    brute_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute}
    ann_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in ann}
    for key in got & truth:
        assert abs(ann_scores[key] - brute_scores[key]) < 1e-9


def test_doc_fingerprints_deterministic_and_sane(spark):
    a = {r["doc_id"]: (r["n_fingerprints"], r["fp_xor"]) for r in Q.q_doc_fingerprints(spark, SF).collect()}
    b = {r["doc_id"]: (r["n_fingerprints"], r["fp_xor"]) for r in Q.q_doc_fingerprints(spark, SF).collect()}
    assert a == b
    assert all(nf > 0 for nf, _ in a.values())
    # winnowing compresses: far fewer fingerprints than shingles
    rows = Q.q_doc_fingerprints(spark, SF).collect()
    assert all(r["n_fingerprints"] <= r["n_shingles"] for r in rows)


def test_multimodal_features_decode_real_containers(spark):
    """Round-5: the decode step is REAL (BMP/WAV parsers in operators/media),
    not a byte-moment stub — pin decoded features against the fixture
    synthesizers computed independently here."""
    import numpy as np

    from minhash_spark.operators import media

    rows = {r["doc_id"]: r for r in Q.q_multimodal_features(spark, SF).collect()}
    assert len(rows) == 500
    for did in list(rows)[:20]:
        r = rows[did]
        if did % 2 == 0:
            img = media.synth_image(did).astype(np.int64)
            assert r["mime"] == "image/bmp"
            assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
            assert r["n_bytes"] == len(media.encode_bmp(media.synth_image(did)))
            assert r["sum_r"] == img[:, :, 0].sum()
            assert r["sum_g"] == img[:, :, 1].sum()
            assert r["sum_b"] == img[:, :, 2].sum()
            assert r["sum_luma_q4"] == (
                (img[:, :, 0] + 2 * img[:, :, 1] + img[:, :, 2]) // 4
            ).sum()
            assert r["n_samples"] is None  # modality columns stay typed-null
        else:
            s = media.synth_audio(did).astype(np.int64)
            assert r["mime"] == "audio/wav"
            assert r["sample_rate"] == media.AUDIO_RATE
            assert r["n_samples"] == len(s)
            assert r["sum_sample"] == s.sum()
            assert r["sum_abs_sample"] == np.abs(s).sum()
            assert r["duration_ms"] == len(s) * 1000 // media.AUDIO_RATE
            assert r["width"] is None


def test_minhash_signatures_are_reference_encoded(spark):
    import base64

    rows = Q.q_minhash_signatures(spark, SF).limit(20).collect()
    for r in rows:
        raw = base64.b64decode(r["sig_b64"])
        # reference encoding: <= 16 bytes (BitSet trailing-zero truncation)
        assert 0 < len(raw) <= 16


def test_lang_id_argmax_and_fallback(spark):
    rows = Q.q_lang_id(spark, SF).collect()
    assert len(rows) == 500
    scores = {r["doc_id"]: r for r in Q.q_lang_marker_scores(spark, SF).collect()}
    langs = ["en", "de", "fr", "es", "zh"]
    for r in rows:
        s = scores[r["doc_id"]]
        mx = max(s[f"score_{l}"] for l in langs)
        if mx == 0:
            assert r["pred_lang"] == "und"
        else:
            # first language (priority order) attaining the max
            expected = next(l for l in langs if s[f"score_{l}"] == mx)
            assert r["pred_lang"] == expected
        assert r["is_correct"] == int(r["pred_lang"] == r["lang"])


def test_quality_filter_reasons(spark):
    rows = Q.q_quality_filter(spark, SF).collect()
    assert len(rows) == 500
    reasons = {r["reason"] for r in rows}
    # corpus discriminates: all three outcomes occur
    assert reasons == {"ok", "too_short", "low_stopword"}
    assert all(r["keep"] == int(r["reason"] == "ok") for r in rows)


def test_source_rollup_totals(spark):
    rows = Q.q_source_rollup(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    tc = {r["doc_id"]: r["n_tokens"] for r in Q.q_token_counts(spark, SF).collect()}
    assert sum(r["total_tokens"] for r in rows) == sum(tc.values())


def test_near_dup_cluster_sizes_consistent(spark):
    clusters = Q.q_near_dup_clusters(spark, SF).collect()
    hist = {r["cluster_size"]: r["n_clusters"] for r in Q.q_near_dup_cluster_sizes(spark, SF).collect()}
    from collections import Counter
    sizes = Counter(Counter(r["cluster_id"] for r in clusters).values())
    assert hist == dict(sizes)


def test_dedup_summary_consistent(spark):
    row = Q.q_dedup_summary(spark, SF).collect()[0]
    assert row["n_docs"] == 500
    assert row["n_near_dup_pairs"] == Q.q_near_dup_pairs(spark, SF).count()
    n_clusters = Q.q_near_dup_clusters(spark, SF).select("cluster_id").distinct().count()
    assert row["n_clusters"] == n_clusters
    assert abs(row["kept_ratio"] - n_clusters / 500) < 1e-6


def test_embedding_near_dup_clusters_vs_pairs(spark):
    pairs = Q.q_embedding_near_dup_pairs(spark, SF).collect()
    comp = {r["vec_id"]: r["cluster_id"] for r in Q.q_embedding_near_dup_clusters(spark, SF).collect()}
    assert len(comp) == 500
    for p in pairs:  # every verified pair must land in one cluster
        assert comp[p["a_id"]] == comp[p["b_id"]]
    # singletons are their own cluster
    paired = {p["a_id"] for p in pairs} | {p["b_id"] for p in pairs}
    for vid, cid in comp.items():
        if vid not in paired:
            assert cid == vid


def test_cluster_representatives_keep_policy(spark):
    reps = {r["cluster_id"]: r for r in Q.q_cluster_representatives(spark, SF).collect()}
    clusters = Q.q_near_dup_clusters(spark, SF).collect()
    chars = {r["doc_id"]: r["n_chars"] for r in
             Q.load(spark, SF, "documents").select("doc_id", "n_chars").collect()}
    from collections import defaultdict
    members = defaultdict(list)
    for r in clusters:
        members[r["cluster_id"]].append(r["doc_id"])
    assert set(reps) == set(members)
    for cid, docs in members.items():
        best = sorted(docs, key=lambda d: (-chars[d], d))[0]
        assert reps[cid]["rep_doc_id"] == best
        assert reps[cid]["rep_n_chars"] == chars[best]
        assert reps[cid]["cluster_size"] == len(docs)


def test_vocab_mass_conservation(spark):
    rows = Q.q_vocab(spark, SF).collect()
    total = sum(r["n_occurrences"] for r in rows)
    tc = Q.q_token_counts(spark, SF).agg({"n_tokens": "sum"}).first()[0]
    assert total == tc
    assert all(r["doc_freq"] <= 500 and r["doc_freq"] >= 1 for r in rows)


def test_deterministic_sample_stable_and_unbiased(spark):
    a = sorted(r["doc_id"] for r in Q.q_deterministic_sample(spark, SF).collect())
    b = sorted(r["doc_id"] for r in Q.q_deterministic_sample(spark, SF).collect())
    assert a == b  # reproducible
    assert 20 <= len(a) <= 90  # ~10% of 500, binomial 3-sigma bounds


def test_event_sessions_gap_invariant(spark):
    rows = Q.q_event_sessions(spark, SF).collect()
    ev = Q.load(spark, SF, "events")
    from pyspark.sql import functions as F
    n_events = ev.count()
    assert sum(r["n_events"] for r in rows) == n_events
    # sessions of one user never overlap and are separated by > gap
    from collections import defaultdict
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r["session_idx"])
        for s1, s2 in zip(sess, sess[1:]):
            assert s2["start_epoch"] - s1["end_epoch"] > 1800
        for s in sess:
            assert s["duration_s"] == s["end_epoch"] - s["start_epoch"]


def test_event_windowed_counts_totals(spark):
    rows = Q.q_event_windowed_counts(spark, SF).collect()
    ev = Q.load(spark, SF, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["window_start"] % 3600 == 0


def test_similar_docs_topk_contract(spark):
    rows = Q.q_similar_docs_topk(spark, SF).collect()
    assert len(rows) == 50  # 10 queries x top-5
    from collections import defaultdict
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert all(r["doc_id"] != qid for r in rs)
        # jaccard non-increasing with rank; ties broken by doc_id
        for a, b in zip(rs, rs[1:]):
            assert a["jaccard"] > b["jaccard"] or (
                a["jaccard"] == b["jaccard"] and a["doc_id"] < b["doc_id"]
            )


def test_signature_similar_agrees_with_exact_at_top(spark):
    """The signature estimator's top hit should be the exact-Jaccard top hit
    for queries whose top-1 is a clear near-dup (planted pairs)."""
    from collections import defaultdict
    exact5 = defaultdict(set)
    top1 = {}
    for r in Q.q_similar_docs_topk(spark, SF).collect():
        exact5[r["query_id"]].add(r["doc_id"])
        if r["rank"] == 1:
            top1[r["query_id"]] = r
    est = {r["query_id"]: r for r in Q.q_signature_similar_docs(spark, SF).collect()
           if r["rank"] == 1}
    assert set(est) == set(exact5)
    strong = [q for q, r in top1.items() if r["jaccard"] >= 0.8]
    assert strong, "corpus should contain planted near-dups among doc_id<10"
    # 1-bit/128-hash estimator noise can reorder same-cluster members with
    # near-equal Jaccard, but the top estimate must land in the exact top-5
    for q in strong:
        assert est[q]["doc_id"] in exact5[q]


def test_multi_signatures_match_single_config(spark):
    """One-pass copy_to fan-out == three independent single-config passes."""
    rows = {r["doc_id"]: r for r in Q.q_multi_signatures(spark, SF).collect()}
    assert len(rows) == 500
    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import minhash_b64_udf
    from pyspark.sql import functions as F
    docs = Q.load(spark, SF, "documents")
    for name, cfg in {
        "sig_default": MinHashConfig(seed=0, size=128, bit=1, tokenizer="word"),
        "sig_seeded": MinHashConfig(seed=1000, size=128, bit=1, tokenizer="word"),
        "sig_compact": MinHashConfig(seed=1000, size=32, bit=2, tokenizer="word", num_bands=8, rows_per_band=4),
    }.items():
        b64 = minhash_b64_udf(cfg)
        single = {r["doc_id"]: r["s"] for r in
                  docs.select("doc_id", b64(F.col("text")).alias("s")).collect()}
        assert all(rows[d][name] == single[d] for d in rows), name


# ---------------------------------------------------------------------------
# corpus hygiene: repetition, boilerplate spans, decontamination, IVF ANN
# ---------------------------------------------------------------------------


def test_repetition_scores_match_python(spark):
    rows = {r["doc_id"]: r for r in Q.q_repetition_scores(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20).collect()
    import collections

    for d in docs:
        w = d["text"].strip().split()
        if len(w) < 2:
            assert d["doc_id"] not in rows
            continue
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == len(w)
        assert r["n_distinct"] == len(set(w))
        assert abs(r["top_token_ratio"] - max(collections.Counter(w).values()) / len(w)) < 1e-12
        bg = [f"{a} {b}" for a, b in zip(w, w[1:])]
        assert abs(r["top_bigram_ratio"] - max(collections.Counter(bg).values()) / len(bg)) < 1e-12


def test_repetition_scores_long_doc_exact(spark, tmp_path):
    """20k-token document with known multiplicities — the regime where the
    pre-rewrite transform-x-filter form was quadratic. Exact expectations:
    8 distinct tokens x 2500 repeats, top bigram 'tok a' at 2500/19999."""
    text = ("tok a b c d e f g " * 2500).strip()
    p = str(tmp_path / "long")
    spark.createDataFrame([(0, text)], "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    r = Q.q_repetition_scores(spark, p).collect()[0]
    assert r["n_tokens"] == 20000 and r["n_distinct"] == 8
    assert abs(r["top_token_ratio"] - 2500 / 20000) < 1e-12
    assert abs(r["top_bigram_ratio"] - 2500 / 19999) < 1e-12


def test_boilerplate_spans_bounds_and_planted(spark, tmp_path):
    # driver corpus: ratios well-formed
    rows = Q.q_boilerplate_spans(spark, SF).collect()
    assert len(rows) == 500
    assert all(0 <= r["n_shared"] <= r["n_spans"] for r in rows)
    # planted: three docs share one 5-gram span ("alpha beta gamma delta eps")
    shared = "alpha beta gamma delta eps"
    data = [
        (0, f"{shared} one two three four five six"),
        (1, f"zero {shared} seven eight nine ten"),
        (2, f"{shared}"),
        (3, "nothing in common with anyone here at all"),
    ]
    p = str(tmp_path / "planted")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in Q.q_boilerplate_spans(spark, p).collect()}
    assert got[0]["n_shared"] >= 1 and got[1]["n_shared"] >= 1 and got[2]["n_shared"] >= 1
    assert got[3]["n_shared"] == 0
    assert got[2]["shared_ratio"] == 1.0  # its only span IS the shared one


def test_boilerplate_spans_match_python_random(spark, tmp_path):
    """Seeded random corpus, exact per-doc comparison against a direct
    Python doc-frequency computation — pins the complement form
    (n_shared = n_spans - n_solo) to the original >=2-docs semantics,
    including the <5-token whole-text span rule and empty docs."""
    import random
    import re as _re

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    data = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]

    def doc_spans(t):
        w = _re.findall(r"[0-9A-Za-z_]+", t)
        if len(w) < 5:
            return {" ".join(w)}
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    df_count = {}
    for _i, t in data:
        for s in doc_spans(t):
            df_count[s] = df_count.get(s, 0) + 1

    p = str(tmp_path / "rand")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in Q.q_boilerplate_spans(spark, p).collect()}
    assert set(got) == {i for i, _t in data}
    for i, t in data:
        sp = doc_spans(t)
        want_shared = sum(1 for s in sp if df_count[s] >= 2)
        assert got[i]["n_spans"] == len(sp), (i, t)
        assert got[i]["n_shared"] == want_shared, (i, t)


def test_decontaminate_planted_overlap(spark, tmp_path):
    # eval doc 3's text is embedded verbatim inside train doc 25
    ev_text = "the quick brown fox jumps over the lazy dog tonight"
    data = [
        (3, ev_text),
        (4, "completely unrelated eval document text with no overlap here"),
        (25, f"prefix words before {ev_text} and suffix words after"),
        (26, "another clean training document that shares nothing at all"),
    ]
    p = str(tmp_path / "decon")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {(r["train_id"], r["eval_id"]): r["n_shared_spans"] for r in Q.q_decontaminate(spark, p).collect()}
    assert (25, 3) in got and got[(25, 3)] >= 5  # many shared 5-gram spans
    assert all(k == (25, 3) for k in got)


def test_embedding_ann_ivf_recall_on_clustered(spark, tmp_path):
    """IVF's contract: recall 1.0 at nprobe<<nlist on a CLUSTERED corpus
    (the dedup-grade/SemDeDup setting — see q_embedding_ann_ivf docstring)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for vid in range(500):
        c = vid % 10  # queries 0..9 land in 10 distinct clusters
        v = centers[c] + 0.05 * rng.standard_normal(64)
        rows.append((vid, [float(x) for x in v], c))
    p = str(tmp_path / "clustered")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").write.parquet(
        f"{p}/embeddings.parquet"
    )
    brute = Q.q_embedding_topk(spark, p).collect()
    ivf = Q.q_embedding_ann_ivf(spark, p).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(truth) == 50
    recall = len(got & truth) / len(truth)
    assert recall == 1.0, f"IVF recall {recall} < 1.0 on clustered corpus"


def test_ann_operating_curve_monotone_and_consistent(spark, tmp_path):
    """The IVF operating-curve card (q_ann_operating_curve): recall must be
    non-decreasing in nprobe with BOTH endpoints meaningful (recall@nlist is
    exactly 1.0 — probing every cell IS brute force), scan_frac must grow
    with nprobe, and the curve's recall@IVF_NPROBE must equal the recall
    measured directly from q_embedding_ann_ivf's output on the same corpus
    (the card and the ANN must tell the same story)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for vid in range(400):
        v = centers[vid % 10] + 0.05 * rng.standard_normal(64)
        rows.append((vid, [float(x) for x in v]))
    p = str(tmp_path / "curve")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(
        f"{p}/embeddings.parquet"
    )
    curve = {r["nprobe"]: r for r in Q.q_ann_operating_curve(spark, p).collect()}
    assert set(curve) == set(Q.ANN_CURVE_NPROBES)
    recalls = [curve[n]["recall_at_5"] for n in sorted(curve)]
    fracs = [curve[n]["scan_frac"] for n in sorted(curve)]
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), recalls
    assert all(a <= b for a, b in zip(fracs, fracs[1:])), fracs
    assert curve[Q.IVF_CELLS]["recall_at_5"] == 1.0
    assert abs(curve[Q.IVF_CELLS]["scan_frac"] - 1.0) < 0.01
    assert all(r["n_true_pairs"] == 50 for r in curve.values())
    # cross-pin vs the ANN's own output at the production operating point
    truth = {(r["query_id"], r["neighbor_id"]) for r in Q.q_embedding_topk(spark, p).collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in Q.q_embedding_ann_ivf(spark, p).collect()}
    measured = round(len(got & truth) / len(truth), 4)
    assert curve[Q.IVF_NPROBE]["recall_at_5"] == measured


def test_embedding_ann_ivf_scores_exact_on_overlap(spark):
    """On the near-random driver corpus the candidate set shrinks to
    ~nprobe/nlist of the corpus; whatever IVF returns must carry EXACT
    cosines (it always returns a full top-5 per query)."""
    brute = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in Q.q_embedding_topk(spark, SF).collect()}
    ivf = Q.q_embedding_ann_ivf(spark, SF).collect()
    assert len(ivf) == 50
    per_q = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r)
        if (r["query_id"], r["neighbor_id"]) in brute:
            assert abs(r["cos_sim"] - brute[(r["query_id"], r["neighbor_id"])]) < 1e-9
    assert all(len(v) == 5 for v in per_q.values())


def test_clean_text_normalizes_whitespace_and_controls(spark, tmp_path):
    data = [
        (0, "  hello   world \t tabs\nnewline  "),
        (1, "ctrl\x01chars\x1fhere"),
        (2, "already clean"),
    ]
    p = str(tmp_path / "clean")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in Q.q_clean_text(spark, p).collect()}
    assert got[0]["clean_text"] == "hello world tabs newline"
    assert got[1]["clean_text"] == "ctrl chars here"
    assert got[2]["clean_text"] == "already clean"
    assert all(r["n_chars_clean"] == len(r["clean_text"]) for r in got.values())


def test_multimodal_frames_sampled_from_real_ppm_stream(spark):
    """The frame sampler walks real PPM headers; sampled frames' pixel sums
    must equal the synth frames at the deterministic (i * n) // K offsets."""
    import numpy as np

    from minhash_spark.operators import media

    rows = Q.q_multimodal_frames(spark, SF).collect()
    assert len(rows) == 500 * 4  # K samples per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did in list(by_doc)[:15]:
        frames = media.synth_video(did)
        n = len(frames)
        got = sorted(by_doc[did], key=lambda r: r["sample_i"])
        assert [g["sample_i"] for g in got] == [0, 1, 2, 3]
        for g in got:
            idx = (g["sample_i"] * n) // 4
            f = frames[idx].astype(np.int64)
            assert g["frame_idx"] == idx
            assert g["n_frames"] == n
            assert (g["width"], g["height"]) == (f.shape[1], f.shape[0])
            assert g["frame_sum"] == f.sum()


def test_event_props_rollup_matches_json(spark):
    import json as _json

    rows = {r["event_type"]: r for r in Q.q_event_props_rollup(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    agg = {}
    for e in ev:
        k = _json.loads(e["props"])["k"]
        a = agg.setdefault(e["event_type"], [0, 0, None, None])
        a[0] += 1
        a[1] += k
        a[2] = k if a[2] is None else min(a[2], k)
        a[3] = k if a[3] is None else max(a[3], k)
    assert set(rows) == set(agg)
    for t, (n, s, lo, hi) in agg.items():
        r = rows[t]
        assert (r["n_events"], r["sum_k"], r["min_k"], r["max_k"]) == (n, s, lo, hi)


def test_common_spans_deterministic_top(spark):
    a = [(r["span"], r["df"]) for r in Q.q_common_spans(spark, SF).collect()]
    b = [(r["span"], r["df"]) for r in Q.q_common_spans(spark, SF).collect()]
    assert a == b and len(a) == 20
    dfs = [d for _, d in a]
    assert dfs == sorted(dfs, reverse=True)
    assert all(d >= 2 for d in dfs)  # a "common" span is by definition shared


def test_fingerprint_matches_planted_span_copy(spark, tmp_path):
    """A long span copied from doc A into an otherwise-different doc B must
    surface as a fingerprint match even when global Jaccard is low; unrelated
    docs must not pair."""
    span = "the copied function body does something very specific indeed " * 4
    filler = " ".join(f"unique{i} filler words everywhere" for i in range(60))
    filler2 = " ".join(f"other{i} words entirely distinct" for i in range(60))
    data = [
        (1, span + " trailing remainder of the original file"),
        (2, filler + " " + span + " " + filler),  # span embedded in noise
        (3, filler2),
    ]
    p = str(tmp_path / "fp")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {(r["a_id"], r["b_id"]): r["n_shared_fp"]
           for r in Q.q_fingerprint_matches(spark, p).collect()}
    assert (1, 2) in got and got[(1, 2)] >= Q.FP_MIN_SHARED
    assert not any(3 in k for k in got)


def test_fingerprint_matches_runs_on_driver_corpus(spark):
    rows = Q.q_fingerprint_matches(spark, SF).collect()
    # near-dup planted pairs in the corpus share spans; sanity: all pairs ordered
    assert all(r["a_id"] < r["b_id"] and r["n_shared_fp"] >= Q.FP_MIN_SHARED for r in rows)


def test_text_queries_survive_unicode_and_degenerate_docs(spark, tmp_path):
    """CJK, emoji (surrogate pairs in UTF-16), RTL, zero-width chars, empty
    and whitespace-only docs must flow through every text query without
    crashing and with sane outputs (the kernel's UTF-16 handling is
    golden-tested; this pins the query layer's regex/shingle paths)."""
    data = [
        (0, "漢字のテキストです。これは中文混在 mixed with ascii"),
        (1, "emoji 🎉🚀 and 𝒎𝒂𝒕𝒉 alphanumerics 🎉🚀"),
        (2, "مرحبا بالعالم هذا نص عربي"),
        (3, ""),
        (4, "   \t  \n "),
        (5, "normal english text for the control group here"),
        (6, "zero​width​joined​text"),
    ]
    import pyspark.sql.functions as F

    p = str(tmp_path / "uni")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")

    for q in (Q.q_exact_dup_clusters, Q.q_minhash_signatures, Q.q_token_counts,
              Q.q_clean_text, Q.q_doc_fingerprints, Q.q_char_ngram_dup_pairs,
              Q.q_near_dup_pairs, Q.q_boilerplate_spans, Q.q_simhash_near_dup_pairs,
              Q.q_fingerprint_matches, Q.q_multimodal_features):
        rows = q(spark, p).collect()
        assert isinstance(rows, list), q.__name__
    sigs = {r["doc_id"]: r["sig_b64"] for r in Q.q_minhash_signatures(spark, p).collect()}
    assert len(sigs) == 7 and all(v is not None for v in sigs.values())
    clean = {r["doc_id"]: r["clean_text"] for r in Q.q_clean_text(spark, p).collect()}
    assert clean[4] == "" and "漢字" in clean[0]


def test_passage_dedup_flags_exact_dup_docs(spark):
    """Exact-duplicate documents must show dup_ratio 1.0 (every passage of
    each copy occurs at least twice corpus-wide); singleton random docs
    mostly 0."""
    dup = {r["doc_id"]: r for r in Q.q_passage_dedup(spark, SF).collect()}
    exact = Q.q_exact_dup_pairs(spark, SF).collect()
    for p in exact:
        assert dup[p["a_id"]]["dup_ratio"] == 1.0
        assert dup[p["b_id"]]["dup_ratio"] == 1.0
    assert all(r["n_chunks"] >= 1 for r in dup.values())


def test_tfidf_top_terms_shape_and_scores(spark):
    rows = Q.q_tfidf_top_terms(spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        assert 1 <= len(rs) <= 3
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert abs(r["score"] - r["tf"] / r["df"]) < 1e-12


def test_lm_scores_bounds_and_dup_equality(spark):
    rows = {r["doc_id"]: r for r in Q.q_lm_scores(spark, SF).collect()}
    for r in rows.values():
        assert 0.0 < r["lm_score"] < 1.0
        assert r["n_tokens"] >= 1
    # exact-dup docs have identical token streams -> identical scores
    for p in Q.q_exact_dup_pairs(spark, SF).collect():
        assert rows[p["a_id"]]["lm_score"] == rows[p["b_id"]]["lm_score"]


def test_cross_corpus_subset_of_near_dups(spark):
    """Cross-corpus pairs = near_dup_pairs restricted to eval x train (the
    asymmetric bucket join must lose nothing vs the full self-join)."""
    full = {
        (r["a_id"], r["b_id"])
        for r in Q.q_near_dup_pairs(spark, SF).collect()
    }
    cross = {
        (min(r["eval_id"], r["train_id"]), max(r["eval_id"], r["train_id"]))
        for r in Q.q_cross_corpus_near_dups(spark, SF).collect()
    }
    expected = {(a, b) for a, b in full if (a < 20) != (b < 20)}
    assert cross == expected


def test_relational_queries_sane(spark):
    ps = Q.q_pricing_summary(spark, SF).collect()
    assert 1 <= len(ps) <= 6
    for r in ps:
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]
        assert abs(r["avg_qty"] - r["sum_qty"] / r["count_order"]) < 1e-9
    top = Q.q_top_revenue_orders(spark, SF).collect()
    assert len(top) <= 10
    revs = [r["revenue"] for r in top]
    assert revs == sorted(revs, reverse=True)


def test_event_funnel_ordering_invariants(spark):
    rows = Q.q_event_funnel(spark, SF).collect()
    assert rows
    n = {1: 0, 2: 0, 3: 0}
    for r in rows:
        n[r["step_reached"]] += 1
        assert r["t_view"] is not None
        if r["step_reached"] >= 2:
            assert r["t_click"] > r["t_view"]
        else:
            assert r["t_click"] == 0
        if r["step_reached"] == 3:
            assert r["t_purchase"] > r["t_click"]
        else:
            assert r["t_purchase"] == 0
    # funnel counts are cumulative-monotone: reached>=k shrinks with k
    assert n[1] + n[2] + n[3] == len(rows)


def test_event_retention_cohort_invariants(spark):
    rows = Q.q_event_retention(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["day_offset"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    total_day0 = sum(d[0] for d in by_cohort.values())
    # every user appears in exactly one cohort's day-0 cell
    users = Q.load(spark, SF, "events").select("user_id").distinct().count()
    assert total_day0 == users
    # retention never exceeds the cohort's day-0 size
    for d in by_cohort.values():
        assert all(v <= d[0] for v in d.values())


def test_cluster_cohesion_planted_chain(spark, tmp_path):
    """A transitive chain A~B~C (A-B and B-C pass 0.8, A-C does not) merges
    into one cluster whose cohesion row exposes the chaining: n_edges == 2
    spanning edges, min_jaccard the weaker link, max the stronger; an exact
    dup pair forms a second cluster with one edge at jaccard 1.0."""
    base = [f"tok{i}" for i in range(60)]
    a = " ".join(base)
    # b: tail 4 tokens replaced -> J(a,b) = 54/62 ~= 0.871 on word-3-shingles
    b = " ".join(base[:56] + ["u1", "u2", "u3", "u4"])
    # c: b with head 6 replaced -> J(b,c) = 52/64 ~= 0.813, but
    # J(a,c) = 48/68 ~= 0.706 < 0.8 -> a~b~c is a true transitive chain
    c = " ".join(["v1", "v2", "v3", "v4", "v5", "v6"] + base[6:56]
                 + ["u1", "u2", "u3", "u4"])
    d = "totally different content here entirely " * 5
    data = [(1, a), (2, b), (3, c), (4, d), (5, d)]
    p = str(tmp_path / "coh")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in Q.q_near_dup_pairs(spark, p).collect()}
    rows = {r["cluster_id"]: r for r in Q.q_cluster_cohesion(spark, p).collect()}
    clusters = {r["doc_id"]: r["cluster_id"]
                for r in Q.q_near_dup_clusters(spark, p).collect()}
    # the exact-dup pair (4,5): one edge, jaccard 1.0
    dup = rows[clusters[4]]
    assert dup["cluster_size"] == 2 and dup["n_edges"] == 1
    assert dup["min_jaccard"] == 1.0 == dup["max_jaccard"]
    # the chain cluster: 3 members joined by exactly the 2 verified edges
    # (a-c itself fails 0.8), weakest link visibly below the strongest
    assert clusters[1] == clusters[2] == clusters[3]
    chain = rows[clusters[1]]
    assert chain["cluster_size"] == 3 and chain["n_edges"] == 2
    assert (1, 3) not in pairs and (3, 1) not in pairs
    assert chain["min_jaccard"] < chain["max_jaccard"]
    # every cohesion row aggregates exactly its cluster's verified edges
    for cid, r in rows.items():
        members = {d for d, c in clusters.items() if c == cid}
        edges = {k: v for k, v in pairs.items()
                 if k[0] in members and k[1] in members}
        assert r["n_edges"] == len(edges) and len(edges) > 0
        assert r["min_jaccard"] == min(edges.values())
        assert r["max_jaccard"] == max(edges.values())
        # spanning connectivity: a cluster of n members needs >= n-1 edges
        assert r["n_edges"] >= r["cluster_size"] - 1


def test_containment_pairs_planted(spark, tmp_path):
    """q_containment_dup_pairs: the containment branch accepts a verbatim
    embedded doc (low global Jaccard), the substring witness rejects a
    shingles-subset-but-not-contiguous pair, and the Jaccard branch still
    fires for ordinary near-dups."""
    embedded = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa"
    )
    big = (
        "zero one two three four " + embedded + " five six seven eight nine "
        "ten eleven twelve thirteen fourteen fifteen sixteen seventeen "
        "eighteen nineteen twenty twentyone twentytwo twentythree"
    )
    # shingles-subset trap: both of doc 20's shingles ("p1 p2 p3", "p2 p3 p4")
    # occur in doc 21, but "p1 p2 p3 p4" is NOT contiguous there
    small2 = "papaone papatwo papathree papafour"
    big2 = (
        "lead in words papaone papatwo papathree quorum middle filler words "
        "bridge papatwo papathree papafour tail words here and more padding"
    )
    nd_a = "red orange yellow green blue indigo violet ultraviolet infrared xray gamma cosmic"
    nd_b = "red orange yellow green blue indigo violet ultraviolet infrared xray gamma delta"
    data = [(1, nd_a), (2, nd_b), (10, embedded), (11, big), (20, small2), (21, big2)]
    p = str(tmp_path / "cont")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{p}/documents.parquet"
    )
    got = {(r["a_id"], r["b_id"]): r for r in Q.q_containment_dup_pairs(spark, p).collect()}
    assert (10, 11) in got, "verbatim embedded doc must be accepted via containment"
    r = got[(10, 11)]
    assert r["containment"] == 1.0 and r["jaccard"] < 0.8
    assert (1, 2) in got and got[(1, 2)]["jaccard"] >= 0.8
    assert (20, 21) not in got, "substring witness must reject shuffled-shingle pair"


def test_stratified_sample_mix_weights(spark):
    rows = Q.q_stratified_sample(spark, SF).collect()
    docs = {r["doc_id"]: r for r in Q.load(spark, SF, "documents").select("doc_id", "lang").collect()}
    total = {}
    for r in docs.values():
        total[r["lang"]] = total.get(r["lang"], 0) + 1
    kept = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        assert r["mix_bucket"] < Q.MIX_WEIGHTS_PERMILLE.get(r["lang"], Q.MIX_DEFAULT_PERMILLE)
    # en keeps everything (rate 1000/1000); downsampled langs keep strictly less
    assert kept["en"] == total["en"]
    for lang in ("es", "zh"):
        assert 0 < kept.get(lang, 0) < total[lang]
    # deterministic: second run identical
    again = Q.q_stratified_sample(spark, SF).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in rows)


def test_leakage_safe_split_never_splits_a_cluster(spark):
    rows = Q.q_leakage_safe_split(spark, SF).collect()
    assert len(rows) == 500
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_cluster.values()), "a cluster straddles splits"
    splits = {s for ss in per_cluster.values() for s in ss}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_source_dedup_report_invariants(spark):
    rows = Q.q_source_dedup_report(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["n_clusters"] <= r["n_exact_unique"] <= r["n_docs"]
        assert 0.0 <= r["near_dup_ratio"] < 1.0


def test_shard_manifest_conserves_corpus(spark):
    """Shard data cards must partition the corpus exactly: doc/token/char
    masses sum to the corpus totals and shard ids stay in [0, N)."""
    rows = Q.q_shard_manifest(spark, SF).collect()
    toks = Q.q_token_counts(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    assert sum(r["total_tokens"] for r in rows) == sum(t["n_tokens"] for t in toks)
    assert sum(r["total_chars"] for r in rows) == sum(t["n_chars_actual"] for t in toks)
    assert all(0 <= r["shard"] < Q.N_MANIFEST_SHARDS for r in rows)
    assert all(1 <= r["n_langs"] and 1 <= r["n_sources"] for r in rows)


def test_dedup_rewrite_keep_first_planted(spark, tmp_path):
    """Keep-first passage rewrite on a planted corpus: an exact copy of an
    earlier doc loses everything; a doc sharing one chunk keeps only its
    novel chunk; within-doc repetition keeps the first instance."""
    A = " ".join(f"a{i}" for i in range(Q.PASSAGE_TOKENS))
    B = " ".join(f"b{i}" for i in range(Q.PASSAGE_TOKENS))
    C = " ".join(f"c{i}" for i in range(Q.PASSAGE_TOKENS))
    D = " ".join(f"d{i}" for i in range(Q.PASSAGE_TOKENS))
    data = [
        (0, f"{A} {B}"),   # original: keeps both chunks
        (1, f"{A} {B}"),   # exact copy: keeps nothing
        (2, f"{A} {C}"),   # shares chunk A: keeps only C
        (3, f"{D} {D}"),   # within-doc repeat: keeps first D
    ]
    import pyspark.sql.functions as F

    p = str(tmp_path / "rw")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")
    out = {r["doc_id"]: r for r in Q.q_dedup_rewrite(spark, p).collect()}
    assert out[0]["n_kept"] == 2 and out[0]["text_kept"] == f"{A} {B}"
    assert out[1]["n_kept"] == 0 and out[1]["text_kept"] == ""
    assert out[2]["n_kept"] == 1 and out[2]["text_kept"] == C
    assert out[3]["n_kept"] == 1 and out[3]["text_kept"] == D
    assert all(r["n_kept"] <= r["n_chunks"] for r in out.values())


def test_dedup_rewrite_driver_corpus_invariants(spark):
    """On the sf0.001 corpus: exact-dup partners (larger doc_id) lose every
    chunk; kept counts never exceed chunk counts; total kept chunks equals
    the number of DISTINCT chunk texts corpus-wide (each survives exactly
    once — the Lee et al. invariant)."""
    out = {r["doc_id"]: r for r in Q.q_dedup_rewrite(spark, SF).collect()}
    for p in Q.q_exact_dup_pairs(spark, SF).collect():
        assert out[max(p["a_id"], p["b_id"])]["n_kept"] == 0
    assert all(0 <= r["n_kept"] <= r["n_chunks"] for r in out.values())
    import pyspark.sql.functions as F

    docs = Q.load(spark, SF, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size(F.col("w")) / F.lit(float(Q.PASSAGE_TOKENS))).cast("long")
    idxs = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    chunk_of = lambda i: F.array_join(  # noqa: E731
        F.slice(F.col("w"), (i * Q.PASSAGE_TOKENS + 1).cast("int"), Q.PASSAGE_TOKENS), " "
    )
    n_distinct = (
        docs.select(w.alias("w"))
        .select(F.explode(F.transform(idxs, chunk_of)).alias("chunk"))
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in out.values()) == n_distinct


def test_word_entropy_bounds_and_degenerate_docs(spark, tmp_path):
    """Entropy ∈ [0, log2(n_tokens)]; an all-identical-token doc scores
    exactly 0.0 (not IEEE -0.0); an all-distinct doc scores log2(n); ttr is
    the exact rational n_distinct/n_tokens."""
    import math

    import pyspark.sql.functions as F

    data = [
        (0, " ".join(["spam"] * 64)),                  # zero entropy
        (1, " ".join(f"w{i}" for i in range(64))),     # max entropy: log2(64)=6
        (2, "the cat sat on the mat the end"),
    ]
    p = str(tmp_path / "ent")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")
    out = {r["doc_id"]: r for r in Q.q_word_entropy_scores(spark, p).collect()}
    assert out[0]["entropy"] == 0.0 and math.copysign(1.0, out[0]["entropy"]) == 1.0
    assert out[0]["ttr"] == 1 / 64
    assert out[1]["entropy"] == 6.0 and out[1]["ttr"] == 1.0
    for r in out.values():
        assert 0.0 <= r["entropy"] <= math.log2(r["n_tokens"]) + 5e-7  # 6-dp round-up
        assert r["ttr"] == r["n_distinct"] / r["n_tokens"]
    # corpus-wide sanity at sf0.001
    rows = Q.q_word_entropy_scores(spark, SF).collect()
    assert len(rows) == 500
    assert all(0.0 <= r["entropy"] <= math.log2(max(r["n_tokens"], 2)) + 5e-7 for r in rows)


def test_threshold_sweep_monotone_and_anchored(spark):
    """Pair counts are non-increasing in the threshold, and the lowest
    threshold (the pipeline's own 0.8 cutoff) recovers exactly the verified
    near-dup pair count."""
    sweep = {r["threshold"]: r["n_pairs"] for r in Q.q_near_dup_threshold_sweep(spark, SF).collect()}
    assert sorted(sweep) == Q.SWEEP_THRESHOLDS
    counts = [sweep[t] for t in sorted(sweep)]
    assert counts == sorted(counts, reverse=True)
    assert sweep[0.80] == Q.q_near_dup_pairs(spark, SF).count()


def test_quality_weighted_sample_tiers_and_determinism(spark, tmp_path):
    """Tier membership is decided by integer cross-multiplication: an
    all-stopword doc lands in the 1000-permille tier (always kept); a
    no-stopword mash doc gets the 100-permille default. Repeated runs are
    identical (content-hash decision)."""
    import pyspark.sql.functions as F

    data = [
        (0, "the of and to in is for the a of"),     # all stopwords -> 1000
        (1, "zqx wvu tsr qpo nml kji hgf edc ba9"),  # none -> 100
        (2, "the cat sat on a mat with the dog near a log here now"),
    ]
    p = str(tmp_path / "qw")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")
    out = {r["doc_id"]: r for r in Q.q_quality_weighted_sample(spark, p).collect()}
    assert 0 in out and out[0]["keep_permille"] == 1000  # always kept
    if 1 in out:
        assert out[1]["keep_permille"] == 100
    a = sorted(r["doc_id"] for r in Q.q_quality_weighted_sample(spark, SF).collect())
    b = sorted(r["doc_id"] for r in Q.q_quality_weighted_sample(spark, SF).collect())
    assert a == b and 0 < len(a) < 500
    for r in Q.q_quality_weighted_sample(spark, SF).collect():
        assert r["qw_bucket"] < r["keep_permille"]


def test_length_histogram_partitions_corpus(spark):
    """Buckets are bit lengths: every doc with 2^(b-1) <= len < 2^b lands in
    bucket b; masses sum to the corpus."""
    rows = Q.q_length_histogram(spark, SF).collect()
    toks = Q.q_token_counts(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    assert sum(r["total_chars"] for r in rows) == sum(t["n_chars_actual"] for t in toks)
    for r in rows:
        b = r["len_bucket"]
        if b > 0:
            assert 2 ** (b - 1) <= r["min_len"] <= r["max_len"] <= 2**b - 1


def test_dedup_growth_curve_monotone_and_anchored(spark):
    """Doc and unique-text counts are non-decreasing in the prefix quarter;
    the full-corpus point matches the exact distinct-text count."""
    import pyspark.sql.functions as F

    rows = sorted(Q.q_dedup_growth_curve(spark, SF).collect(), key=lambda r: r["quarter"])
    assert [r["quarter"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"] and a["n_unique_texts"] <= b["n_unique_texts"]
        assert a["threshold"] < b["threshold"]
        assert a["n_unique_texts"] <= a["n_docs"]
    full = rows[-1]
    docs = Q.load(spark, SF, "documents")
    assert full["n_docs"] == 500
    assert full["n_unique_texts"] == docs.select(F.sha2("text", 256)).distinct().count()


def test_approx_corpus_profile_error_bounds(spark):
    """HLL cardinality within 5*rsd of the exact per-source distinct count;
    quantile sketch values are actual data points in the right order."""
    import pyspark.sql.functions as F

    rows = {r["source"]: r for r in Q.q_approx_corpus_profile(spark, SF).collect()}
    docs = Q.load(spark, SF, "documents")
    exact = {
        r["source"]: r["u"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.sha2("text", 256)).alias("u"))
        .collect()
    }
    assert set(rows) == set(exact) and len(rows) > 1
    for src, r in rows.items():
        rel_err = abs(r["approx_unique_texts"] - exact[src]) / exact[src]
        assert rel_err <= 5 * Q.HLL_RSD, (src, r["approx_unique_texts"], exact[src])
        assert 0 < r["p50_tokens"] <= r["p90_tokens"] <= r["p99_tokens"]
        assert r["approx_unique_texts"] <= r["n_docs"] * (1 + 5 * Q.HLL_RSD)


def test_profile_cli_builds_consistent_card(spark):
    """jobs/datacard.py: the data card's corpus totals agree across sections
    (shards vs length histogram) and every section is bounded-size."""
    from jobs.datacard import build_profile

    card = build_profile(spark, SF)
    assert card["n_docs"] == 500
    assert sum(b["n_docs"] for b in card["length_histogram"]) == card["n_docs"]
    assert sum(b["total_chars"] for b in card["length_histogram"]) == card["total_chars"]
    assert card["unique_content_growth"][-1]["n_docs"] == card["n_docs"]
    assert sum(t["n_kept"] for t in card["quality_tier_kept"]) < card["n_docs"]
    assert len(card["source_profiles"]) >= 2
    for s in card["source_profiles"]:
        assert s["approx_unique_texts"] <= s["n_docs"] * 1.05
    assert card["zipf"]["zipf_slope"] < 0
    assert 0.0 < card["zipf"]["zipf_r2"] <= 1.0
    # dedup cards are OPT-IN (they pay the full edge DAG): absent by default
    assert "dedup" not in card


def test_profile_cli_dedup_cards_internally_consistent(spark):
    """--dedup-cards: the opt-in section's three cards agree with each other
    — locality pairs == half the degree mass, kept docs <= corpus."""
    from jobs.datacard import build_profile

    card = build_profile(spark, SF, dedup_cards=True)
    d = card["dedup"]
    n_edges = sum(b["n_pairs"] for b in d["dup_locality"])
    assert sum(b["degree"] * b["n_docs"] for b in d["dup_graph_degree"]) == 2 * n_edges
    assert sum(s["n_docs"] for s in d["token_savings"]) == card["n_docs"]
    assert all(
        s["tokens_saved"] == s["tokens_total"] - s["tokens_kept"]
        for s in d["token_savings"]
    )


def test_cluster_assign_planted_merge_signal(spark, tmp_path):
    """A new doc near-dup to two UNRELATED existing docs gets the min
    existing cluster id and n_clusters_hit=2 (the would-merge event); a
    novel new doc gets -1."""
    import pyspark.sql.functions as F

    base_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(40))
    base_b = " ".join(f"delta{i} epsi{i} zeta{i}" for i in range(40))
    # doc 7 is the incoming slice (doc_id % 10 == 7); docs 0/1 existing.
    # make 7 a high-Jaccard twin of 0 AND of 1 is impossible with disjoint
    # vocab — instead: 0 and 1 are twins of each other? no, they must be in
    # DIFFERENT clusters. Use near-identical copies: 7 bridges 0 and 1 only
    # if J(7,0)>=0.8 and J(7,1)>=0.8, which forces J(0,1) high too — so
    # test the merge signal with two separate incoming docs instead:
    #   7  ~ 0 (assigned to 0's cluster)
    #   17 ~ nothing (novel, -1)
    #   27 ~ 1 (assigned to 1's cluster)
    data = [
        (0, base_a),
        (1, base_b),
        (2, base_a + " tail0 tail1"),      # existing twin of 0 -> cluster {0,2}
        (7, base_a + " tail2"),            # incoming, matches cluster 0
        (17, " ".join(f"nov{i}" for i in range(60))),  # novel
        (27, base_b + " tail3"),           # incoming, matches cluster 1
    ]
    p = str(tmp_path / "ca")
    spark.createDataFrame(data, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")).write.parquet(f"{p}/documents.parquet")
    out = {r["new_id"]: r for r in Q.q_cluster_assign(spark, p).collect()}
    assert set(out) == {7, 17, 27}
    assert out[7]["assigned_cluster"] == 0 and out[7]["n_clusters_hit"] == 1
    assert out[7]["n_dup_neighbors"] == 2  # matches both 0 and 2
    assert out[17]["assigned_cluster"] == -1 and out[17]["n_dup_neighbors"] == 0
    assert out[27]["assigned_cluster"] == 1 and out[27]["n_clusters_hit"] == 1


def test_cluster_assign_driver_corpus_consistent(spark):
    """Every assignment points at a real existing-doc cluster id; incoming
    docs that the FULL clustering isolates as singletons are -1 here too."""
    rows = {r["new_id"]: r for r in Q.q_cluster_assign(spark, SF).collect()}
    assert len(rows) == 50  # doc_id % 10 == 7 slice of 500
    full = {r["doc_id"]: r["cluster_id"] for r in Q.q_near_dup_clusters(spark, SF).collect()}
    for new_id, r in rows.items():
        assert new_id % 10 == 7
        if r["assigned_cluster"] >= 0:
            assert r["assigned_cluster"] % 10 != 7  # labeled by an existing doc
            assert r["n_dup_neighbors"] >= 1 and r["n_clusters_hit"] >= 1
        else:
            # novel here implies singleton in the full clustering
            assert full[new_id] == new_id


def test_dedup_method_agreement_consistent(spark):
    """The agreement card's marginals must equal the three source pair
    queries exactly, every union pair carries at least one flag, and the
    total equals the distinct union size."""
    card = Q.q_dedup_method_agreement(spark, SF).collect()
    assert all(r["in_word"] or r["in_char"] or r["in_containment"] for r in card)
    word = {(r["a_id"], r["b_id"]) for r in Q.q_near_dup_pairs(spark, SF).collect()}
    char = {(r["a_id"], r["b_id"]) for r in Q.q_char_ngram_dup_pairs(spark, SF).collect()}
    cont = {(r["a_id"], r["b_id"]) for r in Q.q_containment_dup_pairs(spark, SF).collect()}
    assert sum(r["n_pairs"] for r in card) == len(word | char | cont)
    assert sum(r["n_pairs"] for r in card if r["in_word"]) == len(word)
    assert sum(r["n_pairs"] for r in card if r["in_char"]) == len(char)
    assert sum(r["n_pairs"] for r in card if r["in_containment"]) == len(cont)


def test_zipf_fit_matches_numpy_lstsq(spark):
    """Slope/R^2 must match an independent numpy least-squares fit over the
    same top-K (count desc, term asc) ranking, and obey basic shape: negative
    slope (frequency falls with rank), R^2 in (0, 1]."""
    import numpy as np

    row = Q.q_zipf_fit(spark, SF).collect()[0]
    docs = Q.load(spark, SF, "documents").collect()
    from collections import Counter

    c = Counter()
    for r in docs:
        c.update(r["text"].strip().split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: Q.ZIPF_TOP_K]
    assert row["n_terms"] == len(top)
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([n for _, n in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    pred = slope * x + intercept
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    assert abs(row["zipf_slope"] - slope) < 1e-5, (row["zipf_slope"], slope)
    assert abs(row["zipf_r2"] - r2) < 1e-5, (row["zipf_r2"], r2)
    assert row["zipf_slope"] < 0
    assert 0.0 < row["zipf_r2"] <= 1.0


def test_compression_scores_exact_vs_zlib(spark):
    """Byte counts must equal direct zlib.compress(level 6) on every doc,
    and the ratio orders corpora correctly: a highly repetitive text
    compresses far below a high-entropy one."""
    import zlib

    rows = {r["doc_id"]: r for r in Q.q_compression_scores(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"] for r in Q.load(spark, SF, "documents").collect()}
    assert set(rows) == set(docs)
    for did, text in list(docs.items())[:100]:
        b = (text or "").encode("utf-8")
        r = rows[did]
        assert r["n_bytes"] == len(b)
        assert r["n_compressed"] == len(zlib.compress(b, 6))
        if len(b):
            assert r["compression_ratio"] == round(r["n_compressed"] / len(b), 4)


def test_image_phash_dedup_group_structure(spark):
    """X67: every doc's neighbor set should be (a subset of) its planted
    group — cross-group gradients differ in >3 dHash bits except measure-
    zero coincidences, and same-group docs differ only by the sparse
    perturbation. Pin: n_near > 0 for the overwhelming majority (group
    size ~22 at sf0.001), min_ham == 0 exactly for docs sharing a hash,
    and the phash_hex column round-trips to the kernel's dhash64."""
    from minhash_spark.operators import media

    rows = {r["doc_id"]: r for r in Q.q_image_phash_dedup(spark, SF).collect()}
    assert len(rows) == 500
    # hex column matches an independently computed hash for a sample
    for did in (0, 1, 23, 137, 499):
        expect = media.dhash64(media.synth_phash_image(did)) & ((1 << 64) - 1)
        assert rows[did]["phash_hex"] == f"{expect:016x}"
    with_near = sum(1 for r in rows.values() if r["n_near"] > 0)
    assert with_near >= 450  # planted groups of ~22 docs make isolation rare
    # min_ham semantics: 0 iff another doc shares the exact hash
    from collections import Counter

    hashes = Counter(r["phash_hex"] for r in rows.values())
    for r in rows.values():
        if hashes[r["phash_hex"]] > 1:
            assert r["min_ham"] == 0
        elif r["min_ham"] is not None:
            assert 1 <= r["min_ham"] <= media.PHASH_HAM_MAX


def test_sequence_packing_bucket_size_invariance(spark, monkeypatch):
    """X68: the two-phase prefix sum must be independent of the bucket
    granularity — run with 1024-doc buckets and 32-doc buckets and demand
    identical rows; then pin against a local pandas cumsum."""
    base = Q.q_sequence_packing(spark, SF).toPandas()
    monkeypatch.setattr(Q, "PACK_BUCKET_BITS", 5)
    small = Q.q_sequence_packing(spark, SF).toPandas()
    assert base.equals(small)
    # local ground truth
    import pandas as pd

    t = base.sort_values("doc_id").reset_index(drop=True)
    starts = t["n_tokens"].cumsum().shift(fill_value=0)
    assert (t["tok_start"].to_numpy() == starts.to_numpy()).all()
    assert (t["seq_first"] == t["tok_start"] // Q.SEQ_BUDGET).all()
    assert (
        t["seq_last"] == (t["tok_start"] + t["n_tokens"] - 1) // Q.SEQ_BUDGET
    ).all()
    # chunking conserves tokens: total sequences cover the whole stream
    total = int(t["n_tokens"].sum())
    assert int(t["seq_last"].max()) == (total - 1) // Q.SEQ_BUDGET


def test_pack_bucket_bits_bounds_driver_collect():
    """The prefix-sum bucket-sum collect must stay <= 2^16 rows at ANY
    corpus size (the 10^12-doc driver-OOM guard), while small corpora keep
    the 1024-doc minimum granularity."""
    assert Q.pack_bucket_bits(499) == Q.PACK_BUCKET_BITS
    assert Q.pack_bucket_bits(10**6) == Q.PACK_BUCKET_BITS
    for max_id in (10**9, 10**12, 10**15):
        bits = Q.pack_bucket_bits(max_id)
        n_buckets = (max_id >> bits) + 1
        assert n_buckets <= 1 << 16, (max_id, bits, n_buckets)
        # and not absurdly coarse: at least 2^15 buckets of parallelism
        assert n_buckets > 1 << 15


def test_mixture_weights_matches_numpy(spark):
    """X69: weights/shares/epochs recomputed with numpy from the raw table."""
    import numpy as np
    import re

    pdf = Q.q_mixture_weights(spark, SF).toPandas().set_index("source")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("source", "text").toPandas()
    docs["toks"] = docs["text"].map(lambda t: len(re.split(r"\s+", t.strip())))
    g = docs.groupby("source")["toks"].agg(["count", "sum"])
    tot_tokens = g["sum"].sum()
    tot_w = np.sqrt(g["sum"].to_numpy(dtype="float64")).sum()
    assert set(pdf.index) == set(g.index)
    for s in g.index:
        n = int(g.loc[s, "sum"])
        assert pdf.loc[s, "n_docs"] == g.loc[s, "count"]
        assert pdf.loc[s, "n_tokens"] == n
        assert abs(pdf.loc[s, "token_share"] - n / tot_tokens) < 2e-6
        w = np.sqrt(float(n)) / tot_w
        assert abs(pdf.loc[s, "weight"] - w) < 2e-6
        assert abs(pdf.loc[s, "epochs_at_10m"] - w * 1e7 / n) < 2e-4
    # weights sum to ~1 and up-sample small sources vs raw share
    assert abs(pdf["weight"].sum() - 1.0) < 1e-4
    smallest = g["sum"].idxmin()
    largest = g["sum"].idxmax()
    assert pdf.loc[smallest, "weight"] > pdf.loc[smallest, "token_share"]
    assert pdf.loc[largest, "weight"] < pdf.loc[largest, "token_share"]


def test_audio_fingerprint_dedup_group_structure(spark):
    """X71: same assertions as the image twin — hex round-trips to the
    kernel's afp64 over the REAL decode path, planted groups make isolation
    rare, min_ham==0 iff a fingerprint is shared."""
    from minhash_spark.operators import media

    rows = {r["doc_id"]: r for r in Q.q_audio_fingerprint_dedup(spark, SF).collect()}
    assert len(rows) == 500
    for did in (0, 1, 19, 137, 499):
        s = media.synth_afp_audio(did)
        expect = media.afp64(s) & ((1 << 64) - 1)
        assert rows[did]["afp_hex"] == f"{expect:016x}"
    with_near = sum(1 for r in rows.values() if r["n_near"] > 0)
    assert with_near >= 450
    from collections import Counter

    hashes = Counter(r["afp_hex"] for r in rows.values())
    for r in rows.values():
        if hashes[r["afp_hex"]] > 1:
            assert r["min_ham"] == 0
        elif r["min_ham"] is not None:
            assert 1 <= r["min_ham"] <= media.PHASH_HAM_MAX


def test_training_order_is_valid_epoch_reshuffled_permutation(spark):
    """X72: per (epoch, shard) positions are 1..n contiguous, every doc
    appears exactly once per epoch, epochs produce genuinely different
    orders, and the whole card is deterministic across runs."""
    import pandas as pd

    a = Q.q_training_order(spark, SF).toPandas()
    b = Q.q_training_order(spark, SF).toPandas()
    assert a.equals(b)
    assert set(a["epoch"]) == set(range(Q.TRAIN_EPOCHS))
    for e in range(Q.TRAIN_EPOCHS):
        ep = a[a["epoch"] == e]
        assert len(ep) == 500 and ep["doc_id"].nunique() == 500
        for s, grp in ep.groupby("shard"):
            assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # epochs reshuffle: the (shard, pos) assignment of docs must differ
    e0 = a[a["epoch"] == 0].set_index("doc_id")[["shard", "pos"]]
    e1 = a[a["epoch"] == 1].set_index("doc_id")[["shard", "pos"]]
    moved = (e0 != e1.loc[e0.index]).any(axis=1).mean()
    assert moved > 0.5, f"epoch reshuffle moved only {moved:.0%} of docs"
    # shard balance: multiplicative mix spreads the 500 docs sanely
    sizes = a[a["epoch"] == 0].groupby("shard").size()
    assert len(sizes) == Q.TRAIN_SHARDS
    assert sizes.max() < 3 * sizes.min()


def test_video_fingerprint_dedup_group_structure(spark):
    """X73: keyframe-hash hex round-trips through the REAL PPM stream walk,
    planted groups make isolation rare, min_ham==0 iff shared hash."""
    from minhash_spark.operators import media

    rows = {r["doc_id"]: r for r in Q.q_video_fingerprint_dedup(spark, SF).collect()}
    assert len(rows) == 500
    for did in (0, 1, 17, 137, 499):
        frames = media.synth_vfp_video(did)
        expect = media.dhash64(frames[len(frames) // 2]) & ((1 << 64) - 1)
        assert rows[did]["vhash_hex"] == f"{expect:016x}"
    assert sum(1 for r in rows.values() if r["n_near"] > 0) >= 450
    from collections import Counter

    hashes = Counter(r["vhash_hex"] for r in rows.values())
    for r in rows.values():
        if hashes[r["vhash_hex"]] > 1:
            assert r["min_ham"] == 0
        elif r["min_ham"] is not None:
            assert 1 <= r["min_ham"] <= media.PHASH_HAM_MAX


def test_dup_graph_degree_accounts_every_edge(spark):
    """X80: the degree histogram must account every verified edge exactly
    twice (two endpoints), and its doc mass must equal the number of
    distinct docs appearing in the pair list — the histogram is a lossless
    rollup of the edge DAG, not an estimate."""
    edges = Q.q_near_dup_pairs(spark, SF).collect()
    hist = Q.q_dup_graph_degree(spark, SF).collect()
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * len(edges)
    docs_in_edges = {r["a_id"] for r in edges} | {r["b_id"] for r in edges}
    assert sum(r["n_docs"] for r in hist) == len(docs_in_edges)
    assert all(r["degree"] >= 1 for r in hist)
    # recompute the histogram from the raw pair list (independent path)
    from collections import Counter

    deg = Counter()
    for r in edges:
        deg[r["a_id"]] += 1
        deg[r["b_id"]] += 1
    want = Counter(deg.values())
    got = {r["degree"]: r["n_docs"] for r in hist}
    assert got == dict(want)


def test_dedup_token_savings_consistent_with_representatives(spark):
    """X81: per-source identities — savings = total - kept, every doc
    counted once, and the kept set is EXACTLY the cluster-representative
    set (same keep policy as q_cluster_representatives)."""
    rows = Q.q_dedup_token_savings(spark, SF).collect()
    assert rows, "empty savings card"
    for r in rows:
        assert r["tokens_saved"] == r["tokens_total"] - r["tokens_kept"]
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["tokens_kept"] <= r["tokens_total"]
    docs_total = sum(r["n_docs"] for r in rows)
    assert docs_total == Q.load(spark, SF, "documents").count()
    # global kept count == number of clusters (one representative each)
    n_clusters = (
        Q.q_near_dup_clusters(spark, SF).select("cluster_id").distinct().count()
    )
    assert sum(r["n_kept"] for r in rows) == n_clusters
    # and the representative policy is the X3 one: kept token mass equals
    # the token mass of q_cluster_representatives' doc set
    from pyspark.sql import functions as F

    reps = {r["rep_doc_id"] for r in Q.q_cluster_representatives(spark, SF).collect()}
    docs = Q.load(spark, SF, "documents")
    tok = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("t"),
    ).collect()
    kept_mass = sum(r["t"] for r in tok if r["doc_id"] in reps)
    assert sum(r["tokens_kept"] for r in rows) == kept_mass


def test_bpe_pair_stats_matches_python_recount(spark):
    """X82: top-K adjacent-pair counts pinned against a direct Python
    recount over the same token regex, including the deterministic
    (n desc, pair asc) boundary tie-break."""
    import re
    from collections import Counter

    rows = Q.q_bpe_pair_stats(spark, SF).collect()
    assert len(rows) == Q.BPE_PAIR_TOP_K
    texts = [r["text"] for r in Q.load(spark, SF, "documents").select("text").collect()]
    c: Counter = Counter()
    for t in texts:
        w = re.findall(r"[0-9A-Za-z_]+", t)
        for i in range(len(w) - 1):
            c[f"{w[i]} {w[i + 1]}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: Q.BPE_PAIR_TOP_K]
    got = sorted(
        ((r["pair"], r["n"]) for r in rows), key=lambda kv: (-kv[1], kv[0])
    )
    assert got == want
