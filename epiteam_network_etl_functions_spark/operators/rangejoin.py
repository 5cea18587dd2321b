"""Interval (range) containment join without a nested loop.

Spark plans a bare `p.ts >= i.start AND p.ts < i.end` join as
BroadcastNestedLoopJoin — quadratic work and a broadcast of one whole
side. The scalable decomposition: bucket the time axis, explode each
interval to the buckets it covers, equi-join points on (keys, bucket),
then apply the exact containment predicate. Each point lives in exactly
ONE bucket, so every qualifying (point, interval) pair meets exactly once
— no post-join dedup.

Cost model: shuffle(points) + shuffle(intervals × avg_buckets_per
interval). Pick ``bucket_seconds`` near the typical interval length:
too-small buckets multiply the interval side, too-large buckets put many
non-matching pairs through the exact filter. Either way the join is a
hash join on (keys, bucket) and AQE's skew handling applies to hot
buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (half-open: start <= ts < end), optionally also matching on ``keys``.
    Output carries all columns of both inputs (interval's start/end
    included); empty or inverted intervals match nothing."""
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        # a shared non-key column would survive the join twice and make any
        # later reference AMBIGUOUS (or silently bind the wrong side)
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)}; "
            "rename one side before joining"
        )
    b_us = bucket_seconds * 1_000_000
    p = points.withColumn("__bucket", F.expr(f"unix_micros({ts_col}) div {b_us}"))
    i = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start_col}) div {b_us}"),
                    F.expr(f"(unix_micros({end_col}) - 1) div {b_us}"),
                )
            ),
        )
    )
    on = ["__bucket", *keys]
    joined = p.join(i, on, "inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
