"""Native session_window vs the hand-built sessionize: agreement away
from the gap boundary, and the pinned boundary difference AT it."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.operators.sessions import sessionize
from tests.conftest import PARITY_SF_DIR

T0 = dt.datetime(2024, 7, 1)
GAP_S = 3600

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _native_sessions(df):
    return (
        df.groupBy("user_id", F.session_window("ts", f"{GAP_S} seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("session_window.start").alias("start"), "n")
    )


def test_native_matches_handbuilt_on_events(spark):
    """On the testdata (no exact-gap pairs) the native merging-session
    aggregation and the lag/cumsum idiom segment identically."""
    e = catalog.load(spark, PARITY_SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    )
    native = {
        (r["user_id"], r["start"], r["n"]) for r in _native_sessions(e).collect()
    }
    hand = (
        sessionize(e, "user_id", "ts", "event_id", gap_seconds=GAP_S)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n"))
    )
    handset = {(r["user_id"], r["start"], r["n"]) for r in hand.collect()}
    assert native == handset


def test_boundary_semantics_pinned(spark):
    """Event at exactly last_ts + gap: native session_window MERGES it
    (closed boundary, probed empirically on Spark 4) — matching the
    hand-built `> gap` new-session rule. One microsecond later splits.
    Pinned so a Spark behavior change (or an oracle `>=` regression)
    fails loudly."""
    at_gap = [
        (1, T0, 10),
        (1, T0 + dt.timedelta(seconds=GAP_S), 11),  # exactly at the boundary
    ]
    df = spark.createDataFrame(at_gap, SCHEMA)
    assert _native_sessions(df).count() == 1
    hand = sessionize(df, "user_id", "ts", "event_id", gap_seconds=GAP_S)
    assert hand.agg(F.countDistinct("session_id")).collect()[0][0] == 1

    past_gap = [
        (1, T0, 10),
        (1, T0 + dt.timedelta(seconds=GAP_S, microseconds=1), 11),
    ]
    df2 = spark.createDataFrame(past_gap, SCHEMA)
    assert _native_sessions(df2).count() == 2
    hand2 = sessionize(df2, "user_id", "ts", "event_id", gap_seconds=GAP_S)
    assert hand2.agg(F.countDistinct("session_id")).collect()[0][0] == 2
