"""ARMED LOCK for transformWithStateInPandas (streaming/tws.py).

The TWS Python driver worker needs a working google.protobuf; this
container's is broken (`cannot import name 'descriptor'`), so the full
differential SKIPS here and runs automatically in any environment with
a functional protobuf — the same discipline as the real-h3 parity lock
(tests/test_hexgrid_h3.py).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _protobuf_works() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_works(),
    reason="google.protobuf broken in this container; TWS driver worker "
    "cannot initialize (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)",
)
def test_tws_running_totals_match_batch(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.tws import (
        running_totals_stream,
    )

    e = catalog.load(spark, SF_DIR, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    src = str(tmp_path / "src")
    e.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = running_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    res = (
        spark.table("t_tws")
        .groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("cents").alias("cents"))
    )
    exp = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    assert res.exceptAll(exp).count() == 0
    assert exp.exceptAll(res).count() == 0


def test_tws_blocker_is_still_present():
    """If this starts failing, protobuf got fixed — UNSKIP the lock by
    deleting this test and let the differential above run (and consider
    registering a driver query for the surface)."""
    if _protobuf_works():
        pytest.fail(
            "google.protobuf now imports — the TWS lock above is live; "
            "remove this canary and register the TWS driver query"
        )
