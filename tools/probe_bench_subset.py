#!/usr/bin/env python
"""Honest per-query probe matching bench.py's r14 protocol exactly:
small profile, SHUFFLE=4, NO table caching, clearCache + rebuild per
repetition, min-of-N of the timed count().

Use for same-session before/after probes (run it once per code state;
or interleave two checkouts via separate invocations back-to-back on a
quiet host and compare mins). Unlike tools/probe_trio.py (which keeps
the pre-r14 cached protocol for floor archaeology), numbers from this
tool are directly comparable to BENCH_r{14,15} per-query entries.

Usage: python tools/probe_bench_subset.py q1,q2,... [--reps 5]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "1")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = 3
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
            continue
        names.extend(q for q in args[i].split(",") if q)
        i += 1

    from epiteam_network_etl_functions_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("probe-bench-subset")
    registry = entrymod.queries()
    load = os.getloadavg()
    print(f"# loadavg at start: {load[0]:.2f} {load[1]:.2f} {load[2]:.2f}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:  # warm pass, like bench.py
        fn = registry[name]
        fn(spark, SF_DIR).count()
    for name in names:
        fn = registry[name]
        best, n = None, 0
        for _ in range(reps):
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:32s} {best:.3f}s ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
