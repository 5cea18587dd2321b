"""Radius-of-gyration plan + stateful streaming session tracker."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from epiteam_network_etl_functions_spark.plans.gyration import device_rg, rg_rollup


def test_device_rg_zero_for_single_cell(spark):
    pings = spark.createDataFrame(
        [Row(caid="A", h3index_15="g3:0:0")] * 5
        + [Row(caid="B", h3index_15="g3:0:0"), Row(caid="B", h3index_15="g3:0:3")]
    )
    out = {r["caid"]: r for r in device_rg(pings).collect()}
    assert out["A"]["rg"] == 0.0 and out["A"]["n_cells"] == 1
    # B: center = g3:0:0 (tie-break asc), visits: center(1, d=0) + d=3 (1)
    # rg = sqrt((1*0 + 1*9)/2) = sqrt(4.5)
    assert abs(out["B"]["rg"] - 4.5**0.5) < 1e-6
    assert out["B"]["n_cells"] == 2


def test_rg_rollup(spark):
    rgs = spark.createDataFrame(
        [Row(caid="A", rg=1.0), Row(caid="B", rg=3.0), Row(caid="C", rg=5.0)]
    )
    mem = spark.createDataFrame(
        [Row(caid="A", cve_mun="09010"), Row(caid="B", cve_mun="09010"),
         Row(caid="C", cve_mun="15020")]
    )
    out = {r["cve_mun"]: r for r in rg_rollup(rgs, mem).collect()}
    assert out["09010"]["avg_rg"] == 2.0 and out["09010"]["n_devices"] == 2
    assert out["15020"]["std_rg"] == 0.0  # single device -> coalesced


def test_streaming_session_tracker(spark, tmp_path):
    from epiteam_network_etl_functions_spark.streaming.stateful import (
        streaming_session_tracker,
    )

    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        # user 1: session of 3 events, 2h gap, session of 1 event (open)
        Row(user_id=1, ts=base),
        Row(user_id=1, ts=base + dt.timedelta(minutes=10)),
        Row(user_id=1, ts=base + dt.timedelta(minutes=20)),
        Row(user_id=1, ts=base + dt.timedelta(hours=3)),
        # user 2: one open session
        Row(user_id=2, ts=base),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_session_tracker(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = sorted(
        spark.sql("SELECT * FROM sessions_out").collect(),
        key=lambda r: (r["user_id"], r["session_no"]),
    )
    # user 1's first session closed by the 2h gap; user 2's idle session
    # flushed by the event-time timeout (watermark base+3h-10m passed its
    # last event + 1h gap). user 1's second session (base+3h) is still open:
    # its timeout base+4h is beyond the final watermark.
    assert [(r["user_id"], r["session_no"], r["n_events"]) for r in out] == [
        (1, 1, 3),
        (2, 1, 1),
    ]
