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
