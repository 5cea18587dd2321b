"""weighted_sample_topn: determinism, weight bias, weight-edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.operators.sampling import (
    weighted_sample_topn,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, w bigint")


def test_deterministic_under_repartition(spark):
    rows = [(i, 10 + (i % 7)) for i in range(200)]
    df = _df(spark, rows)
    a = {r["id"] for r in weighted_sample_topn(df, "id", "w", 20).collect()}
    b = {
        r["id"]
        for r in weighted_sample_topn(df.repartition(13), "id", "w", 20).collect()
    }
    assert len(a) == 20
    assert a == b


def test_zero_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None), (5, 5)], "id bigint, w bigint"
    )
    got = {r["id"] for r in weighted_sample_topn(df, "id", "w", 10).collect()}
    assert got == {1, 5}


def test_weight_bias(spark):
    """One heavy row (100x) is selected far more often than any light row
    across independent salts."""
    rows = [(i, 1) for i in range(100)] + [(999, 100)]
    df = _df(spark, rows)
    heavy = light = 0
    for s in range(30):
        ids = {
            r["id"]
            for r in weighted_sample_topn(df, "id", "w", 5, salt=f"s{s}").collect()
        }
        heavy += 999 in ids
        light += 0 in ids
    # P(heavy in sample of 5 from total weight 200) ~ 1; P(light) ~ 2.5%
    assert heavy >= 25
    assert light <= 5
