"""Bucketed interval join: equivalence with the naive theta join on
randomized data (several bucket widths), half-open boundary semantics,
and the no-duplicate property (each point lives in one bucket)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row, functions as F

from epiteam_network_etl_functions_spark.operators.rangejoin import interval_join

BASE = dt.datetime(2024, 3, 1)


def _mk(spark, seed=7, n_points=300, n_intervals=40):
    rng = random.Random(seed)
    pts = [
        Row(user_id=rng.randint(0, 5),
            ts=BASE + dt.timedelta(seconds=rng.randint(0, 7 * 86400)),
            event_id=i)
        for i in range(n_points)
    ]
    ivs = []
    for j in range(n_intervals):
        s = BASE + dt.timedelta(seconds=rng.randint(0, 6 * 86400))
        ivs.append(
            Row(user_id=rng.randint(0, 5), start_ts=s,
                end_ts=s + dt.timedelta(seconds=rng.randint(0, 2 * 86400)),
                iv_id=j)
        )
    return spark.createDataFrame(pts), spark.createDataFrame(ivs)


def _naive(points, intervals):
    return (
        points.join(intervals, "user_id")
        .where((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .select("event_id", "iv_id")
    )


def test_matches_theta_join_across_bucket_widths(spark):
    points, intervals = _mk(spark)
    want = sorted((r["event_id"], r["iv_id"]) for r in _naive(points, intervals).collect())
    assert want  # non-degenerate fixture
    for bucket_s in (600, 3600, 86400, 7 * 86400):
        got = sorted(
            (r["event_id"], r["iv_id"])
            for r in interval_join(
                points, intervals, ts_col="ts", start_col="start_ts",
                end_col="end_ts", keys=["user_id"], bucket_seconds=bucket_s,
            ).select("event_id", "iv_id").collect()
        )
        assert got == want, f"bucket={bucket_s}"
        assert len(got) == len(set(got))  # exactly-once per pair


def test_half_open_boundaries(spark):
    t0 = BASE
    t1 = BASE + dt.timedelta(hours=1)
    points = spark.createDataFrame(
        [Row(user_id=1, ts=t0, event_id=0),       # == start -> in
         Row(user_id=1, ts=t1, event_id=1),       # == end -> out
         Row(user_id=1, ts=t1 - dt.timedelta(microseconds=1), event_id=2)]
    )
    intervals = spark.createDataFrame(
        [Row(user_id=1, start_ts=t0, end_ts=t1, iv_id=0),
         Row(user_id=1, start_ts=t1, end_ts=t1, iv_id=1)]  # empty -> nothing
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            points, intervals, ts_col="ts", start_col="start_ts",
            end_col="end_ts", keys=["user_id"], bucket_seconds=60,
        ).select("event_id", "iv_id").collect()
    )
    assert got == [(0, 0), (2, 0)]


def test_key_isolation(spark):
    points = spark.createDataFrame([Row(user_id=1, ts=BASE, event_id=0)])
    intervals = spark.createDataFrame(
        [Row(user_id=2, start_ts=BASE - dt.timedelta(hours=1),
             end_ts=BASE + dt.timedelta(hours=1), iv_id=0)]
    )
    assert interval_join(
        points, intervals, ts_col="ts", start_col="start_ts",
        end_col="end_ts", keys=["user_id"], bucket_seconds=3600,
    ).count() == 0
