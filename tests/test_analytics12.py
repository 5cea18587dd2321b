"""analytics12 invariants that the oracle hash cannot express (the
oracle parity gate lives in tests/test_parity.py / tools/verify_driver.py):
the Z-order locality guarantee, zone-map pruning dominance, JL distortion
concentration, and the conservation laws of the migration / session
matrices."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import workload

workload.load_all()
SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return workload.REGISTRY[name](spark, SF)


def test_morton_bucket_spans_bounded(spark):
    """Dropping 7 low bit-pairs (>> 14 on a 22-bit Morton code) bounds
    every bucket to a 128x128 tile: the Z-order writer's range-scan
    guarantee this query exists to exhibit."""
    rows = _run(spark, "morton_bucket_extent").collect()
    assert rows, "no buckets at sf0.001"
    for r in rows:
        assert 0 <= r["x_span"] <= 127, r
        assert 0 <= r["y_span"] <= 127, r


def test_zonemap_sorted_layout_dominates(spark):
    """Value-sorted files never scan more rows than day-partitioned
    files for the same value predicate, and the sorted scan fraction is
    non-increasing in the threshold."""
    rows = _run(spark, "zonemap_prune_audit").collect()
    by = {(r["threshold"], r["scheme"]): r for r in rows}
    thresholds = sorted({r["threshold"] for r in rows})
    assert len(thresholds) == 9
    prev = None
    for t in thresholds:
        day = by[(t, "day_partitioned")]
        srt = by[(t, "value_sorted")]
        assert srt["rows_scanned"] <= day["rows_scanned"]
        if prev is not None:
            assert srt["scan_fraction"] <= prev + 1e-9
        prev = srt["scan_fraction"]


def test_jl_distortion_concentrates(spark):
    """16-plane Gaussian JL on 64-dim inputs keeps every sampled pair's
    distortion in a loose (0.3, 2.0) band and the mean near 1."""
    rows = _run(spark, "jl_distortion_audit").collect()
    n = sum(r["n_pairs"] for r in rows)
    assert n > 0
    mean = sum(r["avg_distortion"] * r["n_pairs"] for r in rows) / n
    assert 0.8 < mean < 1.2, mean
    assert all(r["min_distortion"] > 0.3 for r in rows)
    assert all(r["max_distortion"] < 2.0 for r in rows)


def test_decile_migration_conserves_users(spark):
    """Matrix total == distinct active users; deciles in [-1, 9]; no
    (-1, -1) cell (a user inactive in both halves has no events)."""
    rows = _run(spark, "user_decile_migration").collect()
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep

    prep(spark)
    n_users = (
        catalog.load(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert -1 <= r["decile_first_half"] <= 9
        assert -1 <= r["decile_second_half"] <= 9
        assert not (
            r["decile_first_half"] == -1 and r["decile_second_half"] == -1
        )


def test_session_matrix_shares_sum_to_one(spark):
    rows = _run(spark, "session_entry_exit_matrix").collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert all(r["n_sessions"] > 0 for r in rows)


def test_wilson_interval_brackets_rate(spark):
    rows = _run(spark, "error_rate_by_hour_wilson").collect()
    assert len(rows) == 24
    for r in rows:
        assert r["wilson_lo"] - 1e-9 <= r["error_rate"] <= r["wilson_hi"] + 1e-9
        assert 0.0 <= r["wilson_lo"] <= r["wilson_hi"] <= 1.0


def test_top_decile_share_bounds(spark):
    """k_top = ceil(n/10) users can hold at most 100% and at least
    k/n of the value; share must sit in (0, 1]."""
    rows = _run(spark, "daily_top_decile_share").collect()
    assert rows
    for r in rows:
        assert 1 <= r["k_top"] == -(-r["n_users"] // 10)
        assert 0.0 < r["top_share"] <= 1.0
        assert r["top_share"] * r["n_users"] >= r["k_top"] * 0.999999


# ---------------------------------------------------------------------------
# analytics13 invariants
# ---------------------------------------------------------------------------


def test_gini_bounds_and_rank_sanity(spark):
    rows = _run(spark, "order_value_gini_by_segment").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r
        assert r["n_orders"] > 0


def test_compaction_plan_contiguous_and_complete(spark):
    """Files cover disjoint contiguous day ranges and conserve rows."""
    rows = sorted(
        _run(spark, "compaction_bin_plan").collect(),
        key=lambda r: r["file_id"],
    )
    assert rows
    total_days = sum(r["n_days"] for r in rows)
    assert total_days == 30
    prev_max = 0
    for r in rows:
        assert r["day_min"] > prev_max, "file ranges overlap or reorder"
        assert r["day_max"] - r["day_min"] + 1 == r["n_days"], (
            "file spans a day hole"
        )
        prev_max = r["day_max"]


def test_hash_partition_balance_near_uniform(spark):
    rows = _run(spark, "hash_partition_balance_audit").collect()
    assert len(rows) == 32
    assert abs(sum(r["ratio_to_mean"] for r in rows) - 32.0) < 1e-3
    # md5 on a uniform key: no bucket should be wildly off at sf0.001
    assert all(0.2 < r["ratio_to_mean"] < 3.0 for r in rows)


def test_join_key_skew_factor_at_least_one(spark):
    rows = _run(spark, "join_key_skew_profile").collect()
    assert {r["key_name"] for r in rows} == {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
    }
    for r in rows:
        assert r["skew_factor"] >= 1.0 - 1e-9
        assert r["max_rows_per_key"] >= r["p99"] >= r["p50"] > 0


def test_recovery_shares_sum_to_one(spark):
    rows = _run(spark, "error_recovery_latency").collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_quarter_end_load_factor_reasonable(spark):
    """Uniform synthetic orderdates: every complete quarter's load
    factor should sit near 1 (no quarter-end hockey stick)."""
    rows = _run(spark, "quarter_end_load_factor").collect()
    assert rows
    complete = [r for r in rows if r["n_orders"] > 50]
    assert complete
    # individual quarters are noisy at sf0.001 (~56 orders/quarter);
    # bound each loosely and pin the order-weighted mean near 1
    for r in complete:
        assert 0.0 <= r["load_factor"] < 5.0, r
    n = sum(r["n_orders"] for r in complete)
    mean = sum(r["load_factor"] * r["n_orders"] for r in complete) / n
    assert 0.6 < mean < 1.6, mean


# ---------------------------------------------------------------------------
# analytics14/15 invariants
# ---------------------------------------------------------------------------


def test_chi2_nonnegative_and_dof(spark):
    rows = _run(spark, "parttype_size_chi2").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["chi2"] >= 0.0
    assert r["dof"] >= 1
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_autocorr_in_unit_interval(spark):
    r = _run(spark, "monthly_revenue_autocorr").collect()[0]
    assert -1.0 <= r["lag1_autocorr"] <= 1.0
    assert r["n_pairs"] >= 70


def test_quintile_mix_shares(spark):
    rows = _run(spark, "priority_mix_by_value_quintile").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["value_quintile"], 0.0)
        by_q[r["value_quintile"]] += r["share"]
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, s in by_q.items():
        assert abs(s - 1.0) < 1e-3, (q, s)


def test_sample_error_curve_shrinks_broadly(spark):
    """Larger samples should estimate better in aggregate: the 20%
    estimate must beat the 1% estimate (individual adjacent fractions
    can invert by luck on one dataset)."""
    rows = {r["sample_pct"]: r for r in _run(spark, "sample_estimate_error_curve").collect()}
    assert set(rows) == {1, 2, 5, 10, 20}
    assert rows[20]["rel_error"] <= rows[1]["rel_error"] + 1e-9
    for r in rows.values():
        # CLT-scaled bound: a 10-row sample (1% at sf0.001) can miss big
        bound = max(0.3, 5.0 / max(r["n_sampled"], 1) ** 0.5)
        assert r["rel_error"] < bound, r


def test_ks_d_in_unit_interval(spark):
    for r in _run(spark, "gap_exponential_ks").collect():
        assert 0.0 <= r["ks_d"] <= 1.0
        assert r["mean_gap_s"] > 0


def test_dict_gain_bounds(spark):
    rows = _run(spark, "dict_encoding_gain_audit").collect()
    assert len(rows) == 6
    for r in rows:
        assert r["n_distinct"] <= r["n_rows"]
        assert r["gain"] < 1.0
