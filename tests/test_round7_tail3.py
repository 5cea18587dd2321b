"""Invariant tests for the round-7 second-continuation batch (oracle
parity for each lives in test_parity.py; these pin the semantic claims the
differential compare can't express): PMI recomputation from raw counts,
BM25 recomputation + hit containment, mutual-kNN reciprocity against a
NumPy reference, ntile balance for the RFM segmentation, and histogram
consistency between the two cluster-level dedup reports."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.workload.text import (
    PMI_MIN_COUNT,
    PMI_TOP_K,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP_K,
    bm25_keyword_search,
    near_dup_cluster_sizes,
    near_dup_cluster_source_mix,
    pmi_collocations,
)
from epiteam_network_etl_functions_spark.workload.tpch import (
    customer_rfm_segments,
)
from epiteam_network_etl_functions_spark.workload.vectors import (
    MUTUAL_K,
    mutual_knn_pairs,
)
from tests.conftest import PARITY_SF_DIR


def _corpus(spark):
    rows = (
        spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet")
        .select("doc_id", "text", "source")
        .collect()
    )
    return {r.doc_id: [t for t in r.text.split(" ") if t] for r in rows}


def test_pmi_matches_raw_count_recomputation(spark):
    docs = _corpus(spark)
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in docs.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nt = sum(uni.values())
    nb = sum(bi.values())
    rows = pmi_collocations(spark, PARITY_SF_DIR).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    prev = None
    for r in rows:
        assert r.n_pair >= PMI_MIN_COUNT
        assert bi[(r.w1, r.w2)] == r.n_pair
        expect = math.log(
            (r.n_pair * 1.0 * nt * nt) / (nb * 1.0 * uni[r.w1] * uni[r.w2])
        )
        assert abs(r.pmi - round(expect, 6)) < 1e-9
        if prev is not None:
            assert r.pmi <= prev
        prev = r.pmi
    # the cut keeps the global maxima: no excluded qualifying bigram may
    # out-score the last kept row (recompute the full census in Python)
    if len(rows) == PMI_TOP_K:
        floor = rows[-1].pmi
        for (w1, w2), c in bi.items():
            if c >= PMI_MIN_COUNT:
                pmi = round(
                    math.log((c * 1.0 * nt * nt) / (nb * 1.0 * uni[w1] * uni[w2])),
                    6,
                )
                kept = any(r.w1 == w1 and r.w2 == w2 for r in rows)
                assert kept or pmi <= floor


def test_bm25_matches_reference_scoring(spark):
    docs = _corpus(spark)
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) * 1.0 / n_docs
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in BM25_TERMS
    }

    def score(doc_id):
        toks = docs[doc_id]
        dl = len(toks)
        total = 0.0
        for t in BM25_TERMS:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            total += (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            )
        return total

    rows = bm25_keyword_search(spark, PARITY_SF_DIR).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    for r in rows:
        assert r.bm25 > 0
        assert any(t in docs[r.doc_id] for t in BM25_TERMS)
        assert abs(r.bm25 - score(r.doc_id)) < 1e-4
    # descending, and no unreturned doc out-scores the cut
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    if len(rows) == BM25_TOP_K:
        floor = rows[-1].bm25
        returned = {r.doc_id for r in rows}
        for d in docs:
            if d not in returned:
                assert score(d) <= floor + 1e-4


def test_mutual_knn_reciprocity_vs_numpy(spark):
    emb = (
        spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(normed @ normed.T, 6)
    np.fill_diagonal(cos, -np.inf)
    # top-k with (cosine desc, vec_id asc) tie-break
    nbrs = {}
    for i, vid in enumerate(ids):
        order = sorted(range(len(ids)), key=lambda j: (-cos[i, j], ids[j]))
        nbrs[vid] = {ids[j] for j in order[:MUTUAL_K]}
    expect = {
        (a, b)
        for a in nbrs
        for b in nbrs[a]
        if a < b and a in nbrs[b]
    }
    rows = mutual_knn_pairs(spark, PARITY_SF_DIR).collect()
    got = {(r.vec_id_a, r.vec_id_b) for r in rows}
    assert got == expect
    for r in rows:
        assert r.vec_id_a < r.vec_id_b
        assert r.same_label in (0, 1)
        assert -1.0 <= r.cosine <= 1.0


def test_rfm_segments_partition_and_ntile_balance(spark):
    orders = spark.read.parquet(f"{PARITY_SF_DIR}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    rows = customer_rfm_segments(spark, PARITY_SF_DIR).collect()
    assert sum(r.n_customers for r in rows) == n_cust
    for dim in range(3):
        per_bin: Counter = Counter()
        for r in rows:
            parts = r.segment.split("-")
            assert len(parts) == 3
            b = int(parts[dim])
            assert 1 <= b <= 4
            per_bin[b] += r.n_customers
        # ntile(4) balance: bin sizes differ by at most 1
        assert max(per_bin.values()) - min(per_bin.values()) <= 1


def test_cluster_source_mix_consistent_with_sizes(spark):
    mix = near_dup_cluster_source_mix(spark, PARITY_SF_DIR).collect()
    for r in mix:
        assert r.cluster_size >= 2
        assert 1 <= r.n_sources <= r.cluster_size
        assert r.cross_source == (1 if r.n_sources > 1 else 0)
    hist: Counter = Counter(r.cluster_size for r in mix)
    sizes = {
        r.cluster_size: r.n_clusters
        for r in near_dup_cluster_sizes(spark, PARITY_SF_DIR).collect()
    }
    assert dict(hist) == sizes
