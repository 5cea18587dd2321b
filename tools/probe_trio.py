#!/usr/bin/env python
"""Micro-harness for the weak bench queries: replicate bench.py's session
(small profile, SPARK_GRAFT_SHUFFLE=4, cached tables), print per-query
min-of-N timings and optionally the formatted plan.

Usage: python tools/probe_trio.py [q1,q2,...] [--explain] [--reps 5]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "1")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPLAIN = "--explain" in sys.argv
REPS = 5
_skip = set()
for i, a in enumerate(sys.argv):
    if a == "--reps":
        REPS = int(sys.argv[i + 1])
        _skip.add(i + 1)
QUERIES = [
    q
    for i, a in enumerate(sys.argv[1:], start=1)
    if not a.startswith("--") and i not in _skip
    for q in a.split(",")
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("probe-trio")
    registry = entrymod.queries()
    catalog.cache_tables(spark, SF_DIR)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = QUERIES or [
        "top_unshipped_orders",
        "large_volume_customers",
        "volume_shipping",
        "top_return_customers",
        "tfidf_top_terms",
    ]
    for name in names:
        fn = registry[name]
        df = fn(spark, SF_DIR)
        df.count()  # warm
        if EXPLAIN:
            print(f"===== {name} =====")
            df.explain("formatted")
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:32s} {best:.3f}s")


if __name__ == "__main__":
    main()
