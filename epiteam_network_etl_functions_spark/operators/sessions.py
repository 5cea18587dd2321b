"""Sessionization: gap-based trip/session segmentation.

The standard lag+cumsum construction: a session break is a gap over the
threshold; the running sum of breaks numbers the sessions. All integer
microsecond arithmetic (engine-portable). One shuffle (the key window);
the streaming analog is `session_window(ts, gap)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap_seconds: int = 3600,
    out_col: str = "session_id",
) -> DataFrame:
    """Add a 1-based per-key session id; rows whose gap from the previous
    row (per key, ordered by ts then tiebreak) exceeds gap_seconds start a
    new session."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us), 1
    ).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(is_new).over(running).cast("bigint"))


def session_stats(
    sessions: DataFrame,
    key_col: str,
    ts_col: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session row counts and duration (exact integer seconds)."""
    return sessions.groupBy(key_col, session_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            f"(max(unix_micros({ts_col})) - min(unix_micros({ts_col}))) div 1000000"
        ).alias("duration_secs"),
    )
