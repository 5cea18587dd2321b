"""Property lock for the per-group-offset rank pattern (the round-10
construction behind order_value_gini_by_segment, user_decile_migration
and priority_mix_by_value_quintile): ONE global_row_number pass ordered
by (group, value, id) minus broadcast cumulative group offsets must
equal the per-group window row_number exactly — on random data with
duplicate values and skewed groups."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from epiteam_network_etl_functions_spark.operators.winners import (
    global_row_number,
)


def _offset_ranks(df):
    """The pattern under test, verbatim from the workload queries."""
    ranked = global_row_number(df, ["g", "v", "uid"], "gr")
    counts = df.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_off = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "g",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    return ranked.join(F.broadcast(offs), "g").select(
        "g", "v", "uid", (F.col("gr") - F.col("off")).alias("rk")
    )


def test_offset_ranks_equal_window_ranks(spark):
    rng = random.Random(1212)
    # skewed groups (one group holds half the rows), heavy value ties
    rows = []
    for uid in range(4_000):
        g = "g0" if rng.random() < 0.5 else f"g{rng.randint(1, 7)}"
        rows.append((g, rng.randint(0, 40), uid))
    df = spark.createDataFrame(rows, "g string, v long, uid long")
    got = _offset_ranks(df)
    ref = df.withColumn(
        "rk_ref",
        F.row_number()
        .over(Window.partitionBy("g").orderBy("v", "uid"))
        .cast("long"),
    )
    j = got.join(ref, ["g", "v", "uid"])
    assert j.count() == 4_000
    assert j.where(F.col("rk") != F.col("rk_ref")).count() == 0


def test_offset_ranks_are_per_group_permutations(spark):
    df = spark.range(0, 3_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 7919 % 13).alias("v"),
        F.col("id").alias("uid"),
    )
    got = _offset_ranks(df)
    per_g = got.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rk").alias("s"),
        F.max("rk").alias("mx"),
        F.min("rk").alias("mn"),
    )
    for r in per_g.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]
        assert r["s"] == r["n"] * (r["n"] + 1) // 2
