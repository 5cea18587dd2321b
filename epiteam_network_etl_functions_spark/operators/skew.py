"""Skew-mitigation helpers: key salting for hot-key aggregations and joins.

AQE's skew-join splitting (on by default, session.py) handles most cases at
runtime; salting is the manual tool for the pathological ones the optimizer
can't split — e.g. a co-location (cell, bucket) group with 10⁶ devices, or
a groupBy where one key holds half the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(
    df: DataFrame, keys: list[str], buckets: int = 16, out_col: str = "n"
) -> DataFrame:
    """Two-level count: shuffle on (key, salt) first so a hot key spreads
    over `buckets` reducers, then combine the partials. Equivalent to a
    plain groupBy().count() — structurally immune to single-reducer
    hot spots. (For algebraic aggs Spark's map-side partial aggregation
    usually suffices; salting matters for countDistinct-style aggs where
    partials can't combine early.)

    The salt is derived from a hash of the whole row (xxhash64 of every
    column), not rand(seed): rand's stream depends on partition layout, so a
    task retry or repartition would re-route rows — counts stay correct but
    the execution is non-deterministic, violating DETERMINISM.md. Hash
    salting is retry-stable and still spreads a hot key uniformly whenever
    the non-key columns vary (the only case where salting helps)."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pn").cast("bigint").alias(out_col))


def salted_join_broadcast_replicate(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-join by salting: the big side gets a random salt, the small side
    is replicated across all salt values (explode), and the join key becomes
    (key, salt) — a hot key's rows now land on `buckets` different
    reducers. Use when the small side is too big to broadcast outright but
    cheap to replicate `buckets`×. Salt is hash-derived (see salted_count)
    so retries re-route rows identically."""
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(buckets)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")
