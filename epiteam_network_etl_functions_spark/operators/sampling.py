"""Dataset-curation sampling: deterministic splits and stratified draws.

Training-data pipelines need reproducible membership: the same document
must land in the same split on every run, on every engine, at any
parallelism. Hash-based assignment gives that for free — no RNG state, no
ordering dependence — and is exactly expressible in SQL (md5 arithmetic),
so split logic is auditable by the differential gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: Column, buckets: int, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): md5-derived 48-bit integer mod n.
    Salt separates independent bucketings over the same ids."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % buckets).cast(
        "bigint"
    )


def with_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash percentile — membership depends only on
    the id, so re-runs, backfills and engine swaps agree row-for-row."""
    b = hash_bucket(F.col(id_col), 100, salt)
    return df.withColumn(
        out_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash
    percentile falls under the stratum's fraction. Unlike `sampleBy` (RNG
    per partition), this is stable under repartitioning and incremental
    re-runs — the property curation pipelines actually need."""
    b = hash_bucket(F.col(id_col), 1_000_000, salt)
    frac = None
    for stratum, f in fractions.items():
        cond = F.col(stratum_col) == stratum
        frac = F.when(cond, F.lit(f)) if frac is None else frac.when(cond, F.lit(f))
    frac = frac.otherwise(F.lit(0.0))
    return df.where(b < frac * 1_000_000)
