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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join (half-open: overlap iff
    l_start < r_end AND r_start < l_end), optionally keyed — the second
    range-join shape (session-vs-session, outage-vs-campaign) Spark would
    otherwise plan as a BroadcastNestedLoopJoin.

    Same bucketed decomposition as :func:`interval_join`, except BOTH
    sides explode to their covered buckets, so an overlapping pair can
    meet in every shared bucket. Exactly-once is restored structurally
    (no post-join dedup): a pair is emitted only in the bucket containing
    ``max(l_start, r_start)`` — for an overlapping pair that bucket is
    covered by both sides (max_start lies inside both intervals), and
    there is exactly one such bucket. Cost: shuffle(each side ×
    avg_buckets_per_interval); pick bucket_seconds near the typical
    interval length, and AQE skew handling covers hot buckets.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"left and right share non-key columns {sorted(overlap)}; "
            "rename one side before joining"
        )
    b_us = bucket_seconds * 1_000_000

    def _explode(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.where(F.col(end) > F.col(start)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start}) div {b_us}"),
                    F.expr(f"(unix_micros({end}) - 1) div {b_us}"),
                )
            ),
        )

    l = _explode(left, l_start, l_end)
    r = _explode(right, r_start, r_end)
    canonical = F.expr(
        f"greatest(unix_micros({l_start}), unix_micros({r_start})) div {b_us}"
    )
    joined = (
        l.join(r, ["__bucket", *keys], "inner")
        .where(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__bucket") == canonical)
        )
    )
    return joined.drop("__bucket")
