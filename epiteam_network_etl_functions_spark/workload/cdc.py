"""CDC workload: the incremental-update kernels (operators/cdc.py) as
oracle-checked queries over an events-shaped feed.

The `events` table is split at a fixed cutover date into a "current"
snapshot (rows before) and a CDC "updates" batch (rows at/after) — the
daily re-land shape of a 100 TB training-data pipeline. Because the
operators' contracts are closed under that split (latest-wins upsert and
SCD2 chaining both reconstruct the full-history window form), the DuckDB
oracle is a plain window over the whole table, making the differential a
genuine semantics check of the merge algebra, not a restatement of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog
from ..operators.cdc import scd2_apply, upsert_latest
from ..operators.winners import top1_per_key
from ..session import prep
from . import query

CUTOVER = "2024-01-21"  # ~2/3 history, ~1/3 updates at every sf

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    prep(spark)
    e = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    cut = F.lit(CUTOVER).cast("timestamp")
    return e.where(F.col("ts") < cut), e.where(F.col("ts") >= cut)


@query(
    "upsert_latest",
    oracle=f"""
    SELECT user_id, event_type, event_id,
           round(value, 6) AS value_r,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_s
    FROM (
        SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def upsert_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins MERGE emulation: current snapshot + CDC batch -> one
    surviving row per (user_id, event_type). The oracle windows the whole
    table — the upsert must reconstruct exactly that."""
    current, updates = _split(spark, sf_dir)
    merged = upsert_latest(
        current, updates, ["user_id", "event_type"], "ts", "event_id"
    )
    return merged.select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 6).alias("value_r"),
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_s"),
    )


@query(
    "scd2_apply",
    oracle=f"""
    WITH ded AS (
        SELECT user_id, event_type, ts, event_id, value FROM (
            SELECT user_id, event_type, ts, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type, ts
                       ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT user_id, event_type, event_id,
           round(value, 6) AS value_r,
           strftime(ts, '{_TS_FMT_DUCK}') AS valid_from_s,
           strftime(lead(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts ASC),
               '{_TS_FMT_DUCK}') AS valid_to_s
    FROM ded
    """,
)
def scd2_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 batch apply: close the open row of every touched key at the
    first update's timestamp and chain the batch's own versions. History is
    the pre-cutover chain (lead within the slice, last row open); the
    oracle is the lead window over the full deduped table, which the apply
    must reconstruct — boundary rows close at the first post-cutover ts."""
    current, updates = _split(spark, sf_dir)
    # One canonical row per (key, ts): SQL lead over exact-ts duplicates is
    # order-ambiguous, so the differential gate needs the dedupe first.
    ded_cur = top1_per_key(
        current, ["user_id", "event_type", "ts"], [F.desc("event_id")]
    )
    ded_upd = top1_per_key(
        updates, ["user_id", "event_type", "ts"], [F.desc("event_id")]
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("valid_from"))
    history = ded_cur.withColumnRenamed("ts", "valid_from").withColumn(
        "valid_to", F.lead("valid_from").over(w)
    )
    applied = scd2_apply(history, ded_upd, ["user_id", "event_type"], "ts")
    return applied.select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 6).alias("value_r"),
        F.date_format("valid_from", _TS_FMT_SPARK).alias("valid_from_s"),
        F.date_format("valid_to", _TS_FMT_SPARK).alias("valid_to_s"),
    )


@query(
    "scd2_version_histogram",
    oracle="""
    WITH ded AS (
        SELECT user_id, event_type, ts FROM (
            SELECT user_id, event_type, ts,
                   row_number() OVER (
                       PARTITION BY user_id, event_type, ts
                       ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    per_key AS (
        SELECT user_id, event_type, count(*) AS n_versions
        FROM ded GROUP BY user_id, event_type
    )
    SELECT n_versions, count(*) AS n_keys
    FROM per_key GROUP BY n_versions
    """,
)
def scd2_version_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-depth distribution of the SCD2 history: how many versions
    each (user, event_type) key carries — the dimension-bloat report a
    warehouse publishes next to its type-2 tables (a key with hundreds
    of versions is churn the modeling layer should snapshot instead of
    chain). Uses the SAME per-(key, ts) dedup the certified scd2_apply
    oracle defines, so the histogram is exactly the version counts of
    that certified history. Two integer aggregates: key-keyed version
    counts (map-side combined), then a tiny depth histogram."""
    prep(spark)
    e = catalog.load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type", "ts").orderBy(
        F.desc("event_id")
    )
    ded = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    per_key = ded.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_versions")
    )
    return per_key.groupBy("n_versions").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
