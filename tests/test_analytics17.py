"""Semantic invariants of the analytics17 tranche (round-13
candidates): properties the DuckDB hash parity can't see — mathematical
range constraints, guarantee postconditions, and cross-query
consistency."""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def a17(spark):
    from epiteam_network_etl_functions_spark.workload import analytics17

    return analytics17


def test_bloom_guarantee_and_fpr_sane(spark, a17):
    row = a17.bloom_membership_audit(spark, SF_DIR).collect()[0]
    # the Bloom guarantee: NO false negatives, ever
    assert row["n_false_negatives"] == 0
    assert row["n_members"] > 0 and row["n_probes"] > 0
    # measured FPR must stay the right side of the saturated-filter
    # theory bound (1 - e^(-kn/m))^k within a loose factor
    k, m = 3, 8192
    fill = 1 - math.exp(-k * row["n_members"] / m)
    assert row["fpr"] <= max(3 * fill**k, 0.002)
    assert 0 < row["n_bits_set"] <= min(k * row["n_members"], m)


def test_s_curve_planner_monotone(spark, a17):
    rows = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in a17.lsh_band_s_curve_planner(spark, SF_DIR).collect()
    }
    for (b, r), row in rows.items():
        assert 0 < row["s50_threshold"] < 1
        assert 0 <= row["p_candidate_at_30"] <= 1
        assert 0 <= row["p_miss_at_80"] <= 1
        # more bands at fixed r: lower threshold, more candidates
        if (b * 2, r) in rows:
            assert rows[(b * 2, r)]["s50_threshold"] < row["s50_threshold"]
            assert (
                rows[(b * 2, r)]["p_candidate_at_30"]
                >= row["p_candidate_at_30"]
            )
        # more rows per band at fixed b: higher threshold
        if (b, r * 2) in rows:
            assert rows[(b, r * 2)]["s50_threshold"] > row["s50_threshold"]


def test_permutation_entropy_bounds(spark, a17):
    for r in a17.value_permutation_entropy(spark, SF_DIR).collect():
        assert 0 <= r["perm_entropy"] <= math.log(6) + 1e-9
        assert r["n_triples"] > 0


def test_l2_triangle_never_violated(spark, a17):
    row = a17.metric_triangle_audit(spark, SF_DIR).collect()[0]
    assert row["l2_violations"] == 0
    assert row["n_triples"] > 0
    assert 0 <= row["cos_violations"] <= row["n_triples"]


def test_f1_mcc_ranges(spark, a17):
    row = a17.nearest_centroid_f1_mcc(spark, SF_DIR).collect()[0]
    assert 0 <= row["macro_f1"] <= 1
    assert -1 <= row["mcc"] <= 1


def test_diurnal_autocorr_in_range(spark, a17):
    rows = a17.diurnal_profile_autocorr(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert -1 - 1e-9 <= r["circ_autocorr"] <= 1 + 1e-9


def test_scd2_postconditions_hold(spark, a17):
    row = a17.scd2_interval_integrity(spark, SF_DIR).collect()[0]
    assert row["n_inverted"] == 0
    assert row["n_noncontiguous"] == 0
    # exactly one open row per chain
    assert row["n_open_rows"] == row["n_chains"] > 0
    assert row["n_versions"] >= row["n_chains"]


def test_motif_census_partitions_user_days(spark, a17):
    import pyspark.sql.functions as F

    from epiteam_network_etl_functions_spark import catalog

    rows = a17.user_daily_motifs(spark, SF_DIR).collect()
    total = sum(r["n_user_days"] for r in rows)
    e = catalog.load(spark, SF_DIR, "events")
    expected = (
        e.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .count()
    )
    assert total == expected


def test_runs_and_levene_shapes(spark, a17):
    runs = a17.value_runs_test(spark, SF_DIR).collect()
    assert len(runs) == 5
    for r in runs:
        assert 1 <= r["n_runs"] <= r["n1"] + r["n2"]
    lev = a17.value_levene_variance_test(spark, SF_DIR).collect()[0]
    assert lev["levene_w"] >= 0
    assert lev["n_groups"] == 5


def test_mutual_information_bounds(spark, a17):
    row = a17.type_hour_mutual_information(spark, SF_DIR).collect()[0]
    # 0 <= I(X;Y) <= min(H(X), H(Y))
    assert -1e-9 <= row["mutual_information"]
    assert row["mutual_information"] <= min(row["h_type"], row["h_hour"]) + 1e-6
    assert row["h_type"] <= math.log(5) + 1e-9
    assert row["h_hour"] <= math.log(24) + 1e-9
