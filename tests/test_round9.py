"""Round-9 locks: the day-partitioned sweep's equality to the global
sweep, chunk-manifest reassembly invariants, SBM census calibration, SEIR
expectation bounds, and the salt-plan / coverage-curve arithmetic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_partitioned_peak_equals_global_sweep(spark):
    """Same semantics, different plan: the carry-forward decomposition
    must reproduce the global prefix sum exactly (peak AND argmin)."""
    a = QS["peak_concurrency"](spark, SF).collect()[0]
    b = QS["peak_concurrency_partitioned"](spark, SF).collect()[0]
    assert a["max_concurrent"] == b["max_concurrent"]
    assert a["at_epoch_s"] == b["at_epoch_s"]


def test_chunk_manifest_reassembles(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.operators.multimodal import (
        attach_binary_payload,
        chunk_payload,
    )
    from epiteam_network_etl_functions_spark.session import prep

    prep(spark)
    docs = catalog.load(spark, SF, "documents").limit(50)
    payload = attach_binary_payload(docs, "doc_id", "text")
    chunks = chunk_payload(payload, chunk_bytes=96)
    rows = chunks.orderBy("doc_id", "chunk_idx").collect()
    originals = {
        r["doc_id"]: bytes(r["payload"]) for r in payload.collect()
    }
    rebuilt: dict[int, bytes] = {}
    for r in rows:
        assert r["chunk_offset"] == r["chunk_idx"] * 96
        assert r["chunk_bytes"] == len(r["chunk"])
        rebuilt[r["doc_id"]] = rebuilt.get(r["doc_id"], b"") + bytes(r["chunk"])
    assert rebuilt == originals
    # n_chunks is consistent: every doc has chunk_idx 0..n_chunks-1
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in per_doc.items():
        n = rs[0]["n_chunks"]
        assert sorted(r["chunk_idx"] for r in rs) == list(range(n))


def test_sbm_census_counts_and_calibration(spark):
    rows = QS["sbm_block_edge_census"](spark, SF).collect()
    total_pairs = sum(r["n_pairs"] for r in rows)
    # nodes with custkey <= 300 at sf0.001: all 150 customers
    n_nodes = 150
    assert total_pairs == n_nodes * (n_nodes - 1) // 2
    for r in rows:
        assert 0 <= r["n_edges"] <= r["n_pairs"]
        assert abs(r["edge_rate"] - r["n_edges"] / r["n_pairs"]) < 1e-6
        # hash-Bernoulli calibration: realized rate within 5 sigma of p
        sigma = math.sqrt(
            r["p_expected"] * (1 - r["p_expected"]) / r["n_pairs"]
        )
        assert abs(r["edge_rate"] - r["p_expected"]) < 5 * sigma + 1e-9


def test_seir_expectation_bounds(spark):
    r = QS["seir_expected_infections"](spark, SF).collect()[0]
    assert 0 < r["n_seeds"] < r["n_nodes"]
    assert r["n_at_risk"] <= r["n_nodes"] - r["n_seeds"]
    assert 0.0 < r["max_node_risk"] <= 1.0
    assert 0.0 < r["expected_new_cases"] <= r["n_at_risk"]


def test_salt_plan_arithmetic(spark):
    for r in QS["hot_cell_salt_plan"](spark, SF).collect():
        n = r["n_devices"]
        assert r["n_pairs"] == n * (n - 1) // 2
        assert r["salt_factor"] == math.ceil(r["n_pairs"] / 64.0)
        assert r["salt_factor"] >= 1


def test_coverage_curve_monotone(spark):
    rows = sorted(
        QS["ngram_coverage_curve"](spark, SF).collect(),
        key=lambda r: r["vocab_k"],
    )
    assert [r["vocab_k"] for r in rows] == [10, 100, 1000]
    cov = [r["coverage"] for r in rows]
    assert all(0 < c <= 1.0 + 1e-9 for c in cov)
    assert cov == sorted(cov)  # more vocab never covers less


def test_ivf_balance_consistency(spark):
    r = QS["ivf_balance_report"](spark, SF).collect()[0]
    assert r["min_occupancy"] <= r["max_occupancy"]
    assert r["max_over_mean"] >= 1.0
    assert 0.0 <= r["gini"] < 1.0
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert r["n_vectors"] == emb.count()


def test_turnover_bounds(spark):
    for r in QS["cell_daily_turnover"](spark, SF).collect():
        assert 0.0 <= r["mean_jaccard"] <= 1.0
        assert abs(r["turnover"] - round(1 - r["mean_jaccard"], 6)) < 2e-6
        assert r["n_day_pairs"] >= 1


def test_commute_asymmetry_bounds(spark):
    for r in QS["commute_asymmetry_index"](spark, SF).collect():
        assert r["total_flow"] == r["flow_ab"] + r["flow_ba"]
        assert 0.0 <= r["asymmetry"] <= 1.0
        assert r["cell_a"] < r["cell_b"]
