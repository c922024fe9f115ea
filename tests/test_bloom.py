"""X70 Bloom-prefiltered decontamination: the bitmap build/probe must have
ZERO false negatives (that is the correctness contract that makes the bloom
path's oracle identical to the exact path's), a sane false-positive rate at
the 16-bits/key sizing, and the end-to-end query must equal q_decontaminate
row-for-row."""

from __future__ import annotations

import numpy as np

from minhash_spark.operators import bloom
from minhash_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def _hashed_df(spark, keys):
    return bloom.with_key_hashes(
        spark.createDataFrame([(k,) for k in keys], "key string"), "key"
    )


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    members = [f"member_{i}" for i in range(2000)]
    others = [f"other_{i}" for i in range(20000)]
    m_bits = 1 << 15  # 16.4 bits/key
    k = bloom.optimal_k(m_bits, len(members))
    bitmap = bloom.build_bitmap(_hashed_df(spark, members), m_bits, k)

    kept_members = bloom.probe_filter(
        _hashed_df(spark, members), spark, bitmap, k, m_bits
    ).count()
    assert kept_members == len(members)  # NO false negatives, ever

    kept_others = bloom.probe_filter(
        _hashed_df(spark, others), spark, bitmap, k, m_bits
    ).count()
    # theoretical fpp at 16 bits/key with optimal k ~ 5e-4; allow 20x slack
    assert kept_others / len(others) < 0.01, kept_others


def test_bloom_positions_use_odd_stride():
    # h2 == 0 must not degenerate the k probes into a single position
    h1 = np.array([123], dtype=np.uint64)
    h2 = np.zeros(1, dtype=np.uint64)
    pos = bloom._positions(h1, h2, 8, 1 << 10)
    assert len(set(pos.ravel().tolist())) == 8


def test_decontaminate_bloom_equals_exact(spark):
    exact = {
        (r["train_id"], r["eval_id"]): r["n_shared_spans"]
        for r in Q.q_decontaminate(spark, SF).collect()
    }
    bloomed = {
        (r["train_id"], r["eval_id"]): r["n_shared_spans"]
        for r in Q.q_decontaminate_bloom(spark, SF).collect()
    }
    assert exact == bloomed and len(exact) > 0


def test_bloom_prefilter_actually_prunes(spark):
    """The scale claim: the probe must reject the overwhelming majority of
    non-contaminated training spans before the exact join."""
    docs = Q.load(spark, SF, "documents")
    spans = Q._doc_spans(docs, Q.BOILERPLATE_N)
    ev = bloom.with_key_hashes(
        spans.where("doc_id < 20").select("span"), "span"
    )
    tr = bloom.with_key_hashes(
        spans.where("doc_id >= 20").select("span"), "span"
    )
    n_keys = ev.count()
    import math

    m_bits = 1 << max(10, math.ceil(math.log2(max(1, 16 * n_keys))))
    k = min(16, bloom.optimal_k(m_bits, n_keys))
    bitmap = bloom.build_bitmap(ev, m_bits, k)
    total = tr.count()
    kept = bloom.probe_filter(tr, spark, bitmap, k, m_bits).count()
    # true matches exist (planted contamination) but are a sliver of the
    # corpus; the prefilter must remove >90% of training spans
    assert kept < 0.1 * total, (kept, total)
