"""Semantic invariants for the round-9 analytics9 module (parity with the
DuckDB oracles is covered by test_parity; these lock the math itself)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_spearman_in_range(spark):
    row = QS["balance_spend_spearman"](spark, SF).collect()[0]
    assert row["n_customers"] > 0
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_mannwhitney_u_bounds(spark):
    """0 <= U <= n1*n2 (U counts the pairs won by group 1)."""
    row = QS["priority_price_mannwhitney"](spark, SF).collect()[0]
    assert 0 <= row["u_statistic"] <= row["n1"] * row["n2"]


def test_chi2_nonnegative_and_dof(spark):
    row = QS["mktsegment_nation_chi2"](spark, SF).collect()[0]
    assert row["chi2"] >= 0.0
    # 5 segments x up-to-25 nations
    assert row["dof"] >= 4


def test_kl_nonnegative(spark):
    """Gibbs' inequality — KL(p||q) >= 0 for every source. Holds even
    with the shared-vocab restriction because BOTH distributions are
    renormalized over the same restricted support... except p's support
    (terms the source uses) is a subset, making this the KL of p against
    a sub-distribution of q — still >= -sum p ln(q_tot_share) bounded
    below by 0 only when q is a proper distribution over p's support.
    Empirically locked at both test SFs; a negative value would flag a
    normalization bug."""
    for r in QS["source_unigram_kl"](spark, SF).collect():
        assert r["kl_divergence"] >= -1e-9, r


def test_entropy_rate_bounds(spark):
    """0 <= H <= ln(n_states); 5 event types -> ln 5 ~ 1.6094."""
    import math

    row = QS["markov_entropy_rate"](spark, SF).collect()[0]
    assert 0.0 <= row["entropy_rate_nats"] <= math.log(5) + 1e-9


def test_theil_nonnegative(spark):
    for r in QS["brand_price_theil"](spark, SF).collect():
        assert r["theil_t"] >= -1e-9, r


def test_seasonal_index_averages_to_one(spark):
    rows = QS["orders_seasonal_index"](spark, SF).collect()
    assert len(rows) == 12
    mean_idx = sum(r["seasonal_index"] for r in rows) / 12
    assert abs(mean_idx - 1.0) < 1e-4


def test_ewma_flags_bounded(spark):
    for r in QS["value_ewma_control"](spark, SF).collect():
        assert 0 <= r["n_flagged"] <= r["n_days"]


def test_capped_reach_dominated_by_exact(spark):
    """Each kept node's capped reach cannot exceed the exact-graph max,
    and total capped nodes <= total nodes (cap only removes)."""
    exact = {
        r["reach"]: r["n_nodes"]
        for r in QS["two_hop_reach_histogram"](spark, SF).collect()
    }
    capped = {
        r["reach"]: r["n_nodes"]
        for r in QS["two_hop_reach_capped"](spark, SF).collect()
    }
    assert sum(capped.values()) <= sum(exact.values())
    if capped and exact:
        assert max(capped) <= max(exact)


def test_stream_join_pairs_match_batch(spark):
    """The streaming interval join must equal the batch interval join
    (the oracle states it in SQL; this locks it Spark-side too)."""
    from pyspark.sql import functions as F

    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep

    prep(spark)
    e = catalog.load(spark, SF, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    x = e.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("xu"), F.col("ts").alias("xts")
    )
    batch = (
        p.join(
            x,
            (F.col("xu") == F.col("pu"))
            & (F.col("xts") >= F.col("pts"))
            & (F.col("xts") <= F.col("pts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("pu").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    got = {
        r["user_id"]: r["n_pairs"]
        for r in QS["stream_purchase_error_pairs"](spark, SF).collect()
    }
    want = {r["user_id"]: r["n_pairs"] for r in batch.collect()}
    assert got == want


def test_kruskal_wallis_bounds(spark):
    """H >= 0; with 5 groups dof = 4."""
    row = QS["priority_price_kruskal_wallis"](spark, SF).collect()[0]
    assert row["dof"] == 4
    assert row["h_statistic"] >= -1e-9


def test_poisson_dispersion_positive(spark):
    for r in QS["hourly_poisson_dispersion"](spark, SF).collect():
        assert r["dispersion_index"] > 0
        assert r["n_hours"] > 1


def test_sketch_audit_error_small(spark):
    """HLL(12) has ~1.6% standard error; reaches here are small-set
    exact-mode sketches, so the estimate should be near-exact."""
    row = QS["two_hop_reach_sketch_audit"](spark, SF).collect()[0]
    assert row["n_nodes"] > 0
    assert row["mean_rel_err"] < 0.05
    assert row["max_rel_err"] < 0.20


def test_logprob_buckets_bounded(spark):
    rows = QS["doc_unigram_logprob"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["nll_bucket"] <= 24


def test_stream_dedup_equals_distinct(spark):
    from pyspark.sql import functions as F

    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep

    prep(spark)
    e = catalog.load(spark, SF, "events")
    want = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: r["n_unique_events"]
        for r in QS["stream_dedup_event_counts"](spark, SF).collect()
    }
    assert got == want


def test_jsonl_roundtrip_doc_count(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep

    prep(spark)
    n_docs = catalog.load(spark, SF, "documents").count()
    rows = QS["jsonl_roundtrip_digest"](spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_wilson_bound_properties(spark):
    """0 <= wilson_lower <= p_hat <= 1 for every ranked supplier."""
    for r in QS["supplier_late_rate_wilson"](spark, SF).collect():
        assert 0.0 <= r["wilson_lower"] <= r["p_hat"] + 1e-9 <= 1.0 + 1e-9


def test_lift_matrix_shape(spark):
    rows = QS["event_type_lift_matrix"](spark, SF).collect()
    # 5 types -> 10 unordered pairs, every lift positive
    assert len(rows) == 10
    for r in rows:
        assert r["lift"] > 0


def test_trend_slopes_partition(spark):
    rows = QS["customer_value_trend_slopes"](spark, SF).collect()
    assert set(r["trend"] for r in rows) <= {"rising", "flat", "falling"}
    assert sum(r["n_customers"] for r in rows) > 0


def test_referential_integrity_clean_testdata(spark):
    """The generated testdata is referentially intact — every FK edge
    must report zero orphans (a nonzero count here means the audit or
    the generator broke)."""
    for r in QS["referential_integrity_audit"](spark, SF).collect():
        assert r["n_orphans"] == 0, r


def test_primary_keys_unique_testdata(spark):
    """Single-column PKs are unique in the generated testdata; lineitem's
    composite (orderkey, linenumber) is NOT — the generator doesn't
    enforce the TPC-H composite PK (sf0.001: 6000 rows, 4599 distinct,
    1401 dups — found BY this audit, which is exactly its job). Lock the
    arithmetic identity for every row and the dup finding for lineitem."""
    rows = QS["primary_key_audit"](spark, SF).collect()
    for r in rows:
        assert r["n_dups"] == r["n_rows"] - r["n_distinct"] >= 0, r
        if not r["pk"].startswith("lineitem"):
            assert r["n_dups"] == 0, r
    li = [r for r in rows if r["pk"].startswith("lineitem")][0]
    assert li["n_dups"] > 0  # the generator's known composite-PK gap
