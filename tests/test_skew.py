"""Skew-mitigation helpers: salted aggregation and salted join."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.operators.skew import (
    salted_count,
    salted_join_broadcast_replicate,
)
from tests.conftest import PARITY_SF_DIR


def test_salted_count_matches_plain(spark):
    e = catalog.load(spark, PARITY_SF_DIR, "events")
    got = {r["event_type"]: r["n"] for r in salted_count(e, ["event_type"]).collect()}
    want = {r["event_type"]: r["count"] for r in e.groupBy("event_type").count().collect()}
    assert got == want


def test_salted_join_matches_plain_join(spark):
    e = catalog.load(spark, PARITY_SF_DIR, "events").select("event_id", "user_id")
    dim = (
        catalog.load(spark, PARITY_SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    salted = salted_join_broadcast_replicate(e, dim, "user_id", buckets=8)
    plain = e.join(dim, "user_id")
    assert salted.count() == plain.count()
    a = sorted((r["event_id"], r["n_events"]) for r in salted.collect())
    b = sorted((r["event_id"], r["n_events"]) for r in plain.collect())
    assert a == b
