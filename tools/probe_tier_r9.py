#!/usr/bin/env python
"""Round-9 new-query tier table: sf0.1 vs the 10x density tier.

Times every query REGISTERED in round 9 (the 11 prefix newcomers + the
10 post-prefix analytics9 queries) at sf0.1 and /tmp/tier10xh9, printing
the SCALING.md tier-table rows. Uses the SCALE shuffle profile (the
round-8 methodology rule: tier measurements must use the tier's shuffle
profile). Each wall is a cold .count() over a fresh plan.

Usage: python tools/probe_tier_r9.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

R9_QUERIES = [
    "sbm_block_edge_census",
    "seir_expected_infections",
    "hot_cell_salt_plan",
    "ngram_coverage_curve",
    "dedup_token_savings_by_source",
    "ivf_balance_report",
    "payload_chunk_manifest",
    "peak_concurrency_partitioned",
    "cell_daily_turnover",
    "commute_asymmetry_index",
    "stream_hourly_event_counts",
    "balance_spend_spearman",
    "priority_price_mannwhitney",
    "mktsegment_nation_chi2",
    "value_ewma_control",
    "orders_seasonal_index",
    "source_unigram_kl",
    "markov_entropy_rate",
    "brand_price_theil",
    "two_hop_reach_histogram",
    "stream_purchase_error_pairs",
]

# Density direction (/tmp/tier10x): event_type namespace is SHARED across
# replicas, so event-literal queries ('purchase', 'error') and the
# colocation/sessionization families see genuine 10x density. The
# horizontal tier (tier10xh9) renames event types per replica and would
# void those filters.
DIRS = ["/root/testdata/sf0.1", "/tmp/tier10x"]


def main() -> None:
    from epiteam_network_etl_functions_spark.session import get_session
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or R9_QUERIES
    spark = get_session("tier-r9-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    print("| query | sf0.1 wall | 10x wall | growth |")
    print("|---|---|---|---|")
    for name in names:
        walls = []
        for d in DIRS:
            t0 = time.perf_counter()
            try:
                qs[name](spark, d).count()
                walls.append(time.perf_counter() - t0)
            except Exception as exc:  # surface, keep going
                print(f"| {name} | ERROR at {d}: {exc} |", flush=True)
                walls.append(float("nan"))
        g = (
            f"{walls[1] / walls[0]:.1f}x"
            if walls[0] and walls[0] == walls[0] and walls[1] == walls[1]
            else "-"
        )
        print(
            f"| {name} | {walls[0]:.2f} s | {walls[1]:.2f} s | {g} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
