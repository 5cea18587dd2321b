#!/usr/bin/env python
"""Runnable demo of the round-12/13 statistical-analysis surface: the
hypothesis-test, time-series-structure, and data-quality-audit queries
from workload/analytics17 run as a monitoring suite over one dataset.

    python examples/statistics_demo.py [sf_dir]

Every result below is a driver-verified query (each has a DuckDB
oracle and closed-form pytest differentials); this script just shows
how a user composes them as a data-health report. Runs in ~1 min on
the sf0.001 testdata; the same plans hold at 100 TB — the statistics
are all computed from grouped exact-integer summaries (calendar-sized
series, 24-bin profiles, contingency grids), never from driver-side
row collections.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from epiteam_network_etl_functions_spark.session import get_session
    from epiteam_network_etl_functions_spark.workload import analytics17 as a17

    spark = get_session("statistics-demo")

    print("== trend: is monthly revenue going anywhere? ==")
    a17.monthly_revenue_mann_kendall(spark, sf_dir).show()
    a17.monthly_revenue_theil_sen(spark, sf_dir).show()

    print("== stream structure: memory, randomness, periodicity ==")
    a17.value_hurst_rescaled_range(spark, sf_dir).show()
    a17.value_ljung_box(spark, sf_dir).show()
    a17.value_runs_test(spark, sf_dir).show()
    a17.diurnal_profile_autocorr(spark, sf_dir).show()
    a17.value_permutation_entropy(spark, sf_dir).show()

    print("== group comparisons ==")
    a17.median_test_customer_supplier(spark, sf_dir).show()
    a17.value_levene_variance_test(spark, sf_dir).show()
    a17.value_two_way_anova(spark, sf_dir).show()

    print("== multiple-testing-controlled anomaly report ==")
    a17.hourly_anomaly_fdr_bh(spark, sf_dir).show()

    print("== dependence and confounding ==")
    a17.type_hour_mutual_information(spark, sf_dir).show()
    a17.quantity_price_gk_gamma(spark, sf_dir).show()
    a17.simpson_paradox_audit(spark, sf_dir).show()

    print("== ops/planner audits ==")
    a17.join_cardinality_estimate_audit(spark, sf_dir).show(truncate=False)
    a17.bloom_membership_audit(spark, sf_dir).show()
    a17.lsh_band_s_curve_planner(spark, sf_dir).show(20)
    a17.out_of_order_depth_histogram(spark, sf_dir).show()

    print("== embedding-space health ==")
    a17.embedding_intrinsic_dim_2nn(spark, sf_dir).show()
    a17.label_silhouette_simplified(spark, sf_dir).show()
    a17.label_davies_bouldin(spark, sf_dir).show()
    a17.nearest_centroid_f1_mcc(spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main()
