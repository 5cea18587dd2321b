#!/usr/bin/env python
"""Time the two classic ETL WRITE-side shapes at a scale tier — the
numbers behind SCALING.md's write story (the read-side probes cover
everything else):

1. Daily re-land: dynamic partition overwrite of ONE day into a
   day-partitioned events table (sources.io.overwrite_partitions) —
   the idempotent-backfill primitive. Measured against the full
   initial partitioned write for contrast.
2. MERGE-style snapshot refresh: latest-per-(user_id, event_type)
   snapshot + one day of CDC rows -> operators.cdc.upsert_latest ->
   rewritten snapshot (the parquet-only MERGE INTO equivalent the
   engine certifies as the `upsert_latest` query).

Usage: python tools/probe_write_refresh.py [tier_dir]
Default tier: /tmp/tier10x (python tools/make_scale_tier.py 10).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tier10x"
WORK = "/tmp/write_refresh_probe"


def main() -> None:
    from pyspark.sql import functions as F

    from epiteam_network_etl_functions_spark.operators.cdc import upsert_latest
    from epiteam_network_etl_functions_spark.session import get_session
    from epiteam_network_etl_functions_spark.sources.io import (
        overwrite_partitions,
        read_partitioned,
        write_partitioned,
        write_single,
    )

    spark = get_session("probe-write-refresh")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)

    events = spark.read.parquet(os.path.join(TIER, "events.parquet"))
    ev = events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    days = [r.day for r in ev.select("day").distinct().orderBy("day").collect()]
    last_day = days[-1]
    n_rows = ev.count()
    print(f"# events: {n_rows} rows across {len(days)} day partitions")

    # 1a. initial partitioned land
    part_path = os.path.join(WORK, "events_by_day")
    t = time.perf_counter()
    write_partitioned(ev, part_path, ["day"])
    w_full = time.perf_counter() - t

    # 1b. one-day dynamic partition overwrite (the daily re-land), with a
    # marker column change so the rewrite is observable
    reland = ev.where(F.col("day") == last_day).withColumn(
        "value", F.col("value") + 0.0
    )
    n_day = reland.count()
    t = time.perf_counter()
    overwrite_partitions(reland, part_path, ["day"])
    w_day = time.perf_counter() - t
    kept = read_partitioned(spark, part_path).count()
    assert kept == n_rows, f"partition overwrite lost rows: {kept} != {n_rows}"

    # 2. MERGE-style snapshot refresh: snapshot excludes the last day,
    # the CDC batch IS the last day, the refresh rewrites the snapshot.
    snap_path = os.path.join(WORK, "latest_snapshot")
    base = ev.where(F.col("day") != last_day)
    snapshot = upsert_latest(
        base, base.limit(0), ["user_id", "event_type"], "ts", "event_id"
    )
    t = time.perf_counter()
    write_single(snapshot, snap_path)
    w_snap0 = time.perf_counter() - t
    n_snap = spark.read.parquet(snap_path).count()

    cdc_batch = ev.where(F.col("day") == last_day)
    t = time.perf_counter()
    merged = upsert_latest(
        spark.read.parquet(snap_path),
        cdc_batch,
        ["user_id", "event_type"],
        "ts",
        "event_id",
    )
    write_single(merged, snap_path + "_v2")
    w_merge = time.perf_counter() - t
    n_snap2 = spark.read.parquet(snap_path + "_v2").count()

    print(f"{'probe':34} {'wall_s':>8} {'rows':>10}")
    print(f"{'initial partitioned write':34} {w_full:8.1f} {n_rows:10d}")
    print(f"{'one-day dynamic overwrite':34} {w_day:8.1f} {n_day:10d}")
    print(f"{'initial snapshot build+write':34} {w_snap0:8.1f} {n_snap:10d}")
    print(f"{'MERGE refresh (read+upsert+write)':34} {w_merge:8.1f} {n_snap2:10d}")
    spark.stop()


if __name__ == "__main__":
    main()
