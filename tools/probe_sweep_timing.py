#!/usr/bin/env python
"""Honest end-to-end timing for near_dup_threshold_sweep (VERDICT r8 #4/#5).

The sweep's PPJoin verify materializes at plan-BUILD time
(_materialize_release localCheckpoints the verified pair set before the
banded rollup is even constructed), so a timed .count() sees only the
4-literal band explode — the round-8 tier row carried a MISLEADING flag
for exactly this. This probe times the two phases separately and reports
the end-to-end wall that retires the flag:

  build_s  = query function call (shingle cache + candidates + PPJoin
             verify + checkpoint — ALL the data work)
  count_s  = the banded rollup over the materialized pairs
  total_s  = what a cold invocation actually costs

Usage: python tools/probe_sweep_timing.py [dir ...]
Defaults: sf0.1 and /tmp/tier10xh9 (scale profile, the tier rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/tier10xh9"]


def main() -> None:
    from epiteam_network_etl_functions_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("sweep-timing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    print("| dir | build s (verify+checkpoint) | count s (band rollup) | total s |")
    print("|---|---|---|---|")
    for d in DIRS:
        t0 = time.perf_counter()
        df = qs["near_dup_threshold_sweep"](spark, d)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        print(
            f"| {d} | {t1 - t0:.2f} | {t2 - t1:.2f} | {t2 - t0:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
