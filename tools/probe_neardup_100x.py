#!/usr/bin/env python
"""near_dup_pairs A/B at the 100x documents tier (SCALING.md, round 14).

Closes the one bench family with a >1.5x sf0.1 ratio that had no
measured 100x trajectory: runs the registered `near_dup_pairs` query
(Spark, scale profile) AND its committed DuckDB oracle on the SAME
500k-doc corpus, count-wrapped both sides, best-of-N — the identical
protocol every other crossover row in SCALING.md used.

Usage: python tools/probe_neardup_100x.py [tier_dir] [--reps N]
Default tier: /tmp/tier100x (documents.parquet at 500k rows; build with
tools/make_scale_tier.py 100).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIER = "/tmp/tier100x"
REPS = 2
# --spark-only: the r14 run established that the DuckDB mirror ABORTS at
# this tier (exhausts all free temp disk in the verify join); re-filling
# ~80 GB of /tmp to re-demonstrate it adds nothing, so the r15 refresh
# re-times only the Spark side under the new text-kernel shape.
SPARK_ONLY = "--spark-only" in sys.argv[1:]
args = [a for a in sys.argv[1:] if a != "--spark-only"]
for i, a in enumerate(args):
    if a == "--reps":
        REPS = int(args[i + 1])
    elif not a.startswith("--") and (i == 0 or args[i - 1] != "--reps"):
        TIER = a


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from epiteam_network_etl_functions_spark.session import get_session

    print(f"tier={TIER} reps={REPS} loadavg={os.getloadavg()}")

    # -- Spark side (scale profile: AQE + skew-join, full shuffle width)
    spark = get_session("probe-neardup-100x")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()["near_dup_pairs"]
    # Cold end-to-end: construction + first count (the query caches its
    # LSH candidate table at plan build, so a warm re-count alone would
    # undercount — the honest wall includes the candidate stage, same
    # reading the round-9 sweep-timing probe established).
    t0 = time.time()
    df = fn(spark, TIER)
    rows = df.count()
    spark_s = time.time() - t0
    warm = []
    for _ in range(max(0, REPS - 1)):
        t0 = time.time()
        rows = df.count()
        warm.append(round(time.time() - t0, 2))
    print(f"spark  near_dup_pairs: {rows} pairs, cold end-to-end "
          f"{spark_s:.2f}s (warm re-counts: {warm})")
    if SPARK_ONLY:
        return

    # -- DuckDB side: the committed oracle, count-wrapped (same protocol
    # as tools/duckdb_bench.py — neither engine pays result delivery)
    sql = entrymod.oracle_sql()["near_dup_pairs"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{TIER}/documents.parquet')"
    )
    dwalls = []
    drows = None
    for _ in range(REPS):
        t0 = time.time()
        drows = con.execute(
            f"SELECT count(*) FROM ({sql}) t"
        ).fetchone()[0]
        dwalls.append(time.time() - t0)
    duck_s = min(dwalls)
    print(f"duckdb near_dup_pairs: {drows} pairs, best {duck_s:.2f}s "
          f"(all: {[round(w, 2) for w in dwalls]})")
    print(f"ratio spark/duck = {spark_s / duck_s:.2f}x  "
          f"(rows match: {rows == drows})")


if __name__ == "__main__":
    main()
