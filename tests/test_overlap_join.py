"""interval_overlap_join vs the naive theta join (exactly-once, edges)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epiteam_network_etl_functions_spark.operators.rangejoin import (
    interval_overlap_join,
)

T0 = dt.datetime(2024, 5, 1)

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("s_start", T.TimestampType()),
        T.StructField("s_end", T.TimestampType()),
        T.StructField("lid", T.LongType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("r_start", T.TimestampType()),
        T.StructField("r_end", T.TimestampType()),
        T.StructField("rid", T.LongType()),
    ]
)


def _intervals(seed, n, id0):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.choice(("a", "b"))
        s = rng.randrange(0, 40_000)
        # spans from sub-bucket to many-bucket (bucket_seconds=3600 below)
        length = rng.choice((60, 1800, 3600, 7200, 20_000))
        rows.append(
            (
                k,
                T0 + dt.timedelta(seconds=s),
                T0 + dt.timedelta(seconds=s + length),
                id0 + i,
            )
        )
    return rows


@pytest.mark.parametrize("seed", [3, 17])
def test_matches_theta_join(spark, seed):
    lrows = _intervals(seed, 60, 0)
    rrows = _intervals(seed + 100, 60, 1000)
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "s_start", "s_end", "r_start", "r_end",
            keys=["k"], bucket_seconds=3600,
        ).collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in ldf.join(rdf, "k")
        .where((F.col("s_start") < F.col("r_end")) & (F.col("r_start") < F.col("s_end")))
        .collect()
    )
    assert want
    assert got == want  # equal AS LISTS: multi-bucket pairs emitted once


def test_touching_intervals_do_not_overlap(spark):
    ldf = spark.createDataFrame(
        [("a", T0, T0 + dt.timedelta(hours=1), 1)], L_SCHEMA
    )
    rdf = spark.createDataFrame(
        [("a", T0 + dt.timedelta(hours=1), T0 + dt.timedelta(hours=2), 2)],
        R_SCHEMA,
    )
    assert (
        interval_overlap_join(
            ldf, rdf, "s_start", "s_end", "r_start", "r_end", keys=["k"]
        ).count()
        == 0
    )


def test_shared_column_guard(spark):
    ldf = spark.createDataFrame(
        [("a", T0, T0 + dt.timedelta(hours=1), 1)], L_SCHEMA
    )
    rdf = ldf  # identical columns, none declared as keys beyond k
    with pytest.raises(ValueError, match="share non-key columns"):
        interval_overlap_join(
            ldf, rdf, "s_start", "s_end", "s_start", "s_end", keys=["k"]
        )
