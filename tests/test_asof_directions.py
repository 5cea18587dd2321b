"""Forward/nearest as-of joins vs pandas merge_asof (the semantics the
direction surface is modeled on), plus inclusive-equality edge cases."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epiteam_network_etl_functions_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)

T0 = dt.datetime(2024, 3, 1)

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lid", T.LongType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("rid", T.LongType()),
    ]
)


def _mk(seed: int):
    """Random left/right frames with unique (k, ts) on the right (the
    operator contract for deterministic results)."""
    import random

    rng = random.Random(seed)
    left, right = [], []
    lid = rid = 0
    for k in ("a", "b", "c"):
        for _ in range(40):
            left.append((k, T0 + dt.timedelta(seconds=rng.randrange(0, 5000)), lid))
            lid += 1
        seen = set()
        for _ in range(15):
            s = rng.randrange(0, 5000)
            if s in seen:
                continue
            seen.add(s)
            right.append((k, T0 + dt.timedelta(seconds=s), rid))
            rid += 1
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("seed", [7, 23])
def test_matches_pandas_merge_asof(spark, direction, seed):
    lrows, rrows = _mk(seed)
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    fn = {
        "backward": asof_join_backward,
        "forward": asof_join_forward,
        "nearest": asof_join_nearest,
    }[direction]
    got = {
        r["lid"]: r["asof_rid"]
        for r in fn(ldf, rdf, ["k"], "ts", ["rid"]).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "rid"]).sort_values("ts")
    want_df = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction=direction, allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }
    assert len(got) == len(lrows)
    assert got == want


def test_forward_exact_match_inclusive(spark):
    ldf = spark.createDataFrame([("a", T0, 1)], L_SCHEMA)
    rdf = spark.createDataFrame(
        [("a", T0, 10), ("a", T0 + dt.timedelta(seconds=5), 11)], R_SCHEMA
    )
    (row,) = asof_join_forward(ldf, rdf, ["k"], "ts", ["rid"]).collect()
    assert row["asof_rid"] == 10  # equal ts matches, not the later row


def test_nearest_tie_prefers_backward(spark):
    ldf = spark.createDataFrame([("a", T0 + dt.timedelta(seconds=10), 1)], L_SCHEMA)
    rdf = spark.createDataFrame(
        [("a", T0, 10), ("a", T0 + dt.timedelta(seconds=20), 11)], R_SCHEMA
    )
    (row,) = asof_join_nearest(ldf, rdf, ["k"], "ts", ["rid"]).collect()
    assert row["asof_rid"] == 10  # equidistant: earlier (backward) row wins


def test_nearest_single_exchange(spark):
    """Both direction fills share one key-partition exchange (two sorts)."""
    lrows, rrows = _mk(1)
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    plan = (
        asof_join_nearest(ldf, rdf, ["k"], "ts", ["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
