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
from ..utils import drain_available_now
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
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("valid_from"))
    # checkpoint the derived chains: scd2_apply consumes history three
    # times (closed filter, open-row join, anti-join) and updates twice
    # (first-update top1 + the union) — without the cut each consumer
    # re-runs the dedup shuffle + lead window (the audit's 6x exchange)
    history = ded_cur.withColumnRenamed("ts", "valid_from").withColumn(
        "valid_to", F.lead("valid_from").over(w)
    ).localCheckpoint(eager=False)
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


_STREAM_COUNTER = [0]


@query(
    "stream_hourly_event_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_s,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events GROUP BY hour_s, event_type
    """,
)
def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING, oracle-certified end-to-end: the events feed
    replayed through readStream -> tumbling 1 h window aggregation ->
    availableNow trigger -> memory sink, compared against the plain batch
    GROUP BY the oracle states. This certifies the streaming operator
    surface (§2.10) through the same differential gate as every batch
    query — the previously tests-only component.

    Epoch-anchored window(ts, '1 hour') == date_trunc('hour') exactly, so
    the streaming state machine must reproduce the batch aggregation
    bit-for-bit once the stream drains. Complete output mode: the result
    is calendar x type bounded (never data-sized), which is what makes a
    memory sink legitimate here; a production deployment swaps the sink
    for foreachBatch/parquet (streaming/sink.py) with update mode and
    watermarked state eviction (streaming/windows.py). Values sum as
    exact integer cents — no float accumulation order dependence between
    the streaming partial aggregates and DuckDB's serial sum."""
    import os
    import tempfile

    prep(spark)
    e = catalog.load(spark, sf_dir, "events").select(
        "event_type", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    tmp = tempfile.mkdtemp(prefix="graft_stream_hourly_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "ckpt")
    # re-land with plain micro timestamps: the streaming reader has no
    # nanosAsLong shim path (catalog normalizes ts on the batch read)
    e.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("value_cents"),
    )
    _STREAM_COUNTER[0] += 1
    name = f"graft_stream_hourly_{os.getpid()}_{_STREAM_COUNTER[0]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q, tmp)
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("hour_s"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("value_cents").cast("bigint").alias("value_cents"),
    )
