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


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1): the 48-bit md5 integer centered to
    (k + 0.5) / 2^48 — never exactly 0 or 1, identical in SQL."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")).cast("binary"))
    k = F.conv(F.substring(h, 1, 12), 16, 10).cast("double")
    return (k + 0.5) / F.lit(float(1 << 48))


def weighted_sample_topn(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    key_col: str = "sample_key",
) -> DataFrame:
    """Distributed weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): per-row key u^(1/w) with u a deterministic hash
    uniform; the n largest keys are the sample. Inclusion probability is
    proportional to weight (exact for the sequential procedure); the
    whole thing is one TakeOrdered pass — no shuffle of the corpus, no
    RNG state, stable under repartitioning and re-runs.

    This is the scalable generalization of the reference's driver-side
    np.random.choice(p=probs) (NetworkBuilder.py:374-381,
    size_scalers.py:377-388): same sampling semantics, but the population
    never leaves the executors. Rows with weight <= 0 or NULL are
    excluded (zero mass). The key is rounded to 9 decimals with an id
    tie-break so the cut is a total order on both engines."""
    w = F.col(weight_col).cast("double")
    u = hash_uniform(F.col(id_col), salt)
    key = F.round(F.pow(u, 1.0 / w), 9)
    return (
        df.where(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.desc(key_col), F.desc(id_col))
        .limit(n)
    )
