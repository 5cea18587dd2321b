"""foreachBatch upsert sink: latest-wins table maintained across
microbatches equals the batch upsert over the full input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from epiteam_network_etl_functions_spark.operators.cdc import upsert_latest
from epiteam_network_etl_functions_spark.streaming.sink import (
    read_upsert_table,
    upsert_sink,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
    ]
)

T0 = dt.datetime(2024, 6, 1)


def _rows():
    rows = []
    seq = 0
    for wave in range(3):
        for k in range(20):
            # every wave updates every key; some ts ties broken by seq
            ts = T0 + dt.timedelta(minutes=wave * 10 + (k % 3))
            rows.append((k, f"v{wave}_{k}", ts, seq))
            seq += 1
    return rows


def test_streamed_upsert_matches_batch(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "src")
    # three files -> three microbatches (waves interleaved across files)
    for i in range(3):
        spark.createDataFrame(rows[i::3], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = upsert_sink(
        stream,
        str(tmp_path / "table"),
        key_cols=["k"],
        ts_col="ts",
        tiebreak_col="seq",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = read_upsert_table(spark, str(tmp_path / "table"))
    assert got is not None
    full = spark.createDataFrame(rows, SCHEMA)
    want = upsert_latest(full.limit(0), full, ["k"], "ts", "seq")
    g = {r["k"]: (r["v"], r["seq"]) for r in got.collect()}
    w = {r["k"]: (r["v"], r["seq"]) for r in want.collect()}
    assert g == w
    assert len(g) == 20  # one surviving row per key


def test_empty_table_before_first_batch(spark, tmp_path):
    assert read_upsert_table(spark, str(tmp_path / "nope")) is None
