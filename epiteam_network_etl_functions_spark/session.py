"""SparkSession factory + runtime prep.

The reference sized a single-machine session by hand
(SparkWrapper.py:10-16: local[*], 50g driver/executor). Here the session is
tuned for local[N] testing but every setting that matters at cluster scale
(AQE, skew-join handling, shuffle partition sizing) is expressed as config,
not code, so the same plans run unchanged on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied at the top of every workload query, so the
# engine behaves identically whether the session is ours or driver-provided.
_RUNTIME_CONF = {
    # DuckDB timestamps are UTC-naive; pin the session so hour()/to_date()
    # and collected datetimes agree with the oracle bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan, partition coalescing, skew-join splitting. The
    # J1-style co-location self-join has hot (cell, bucket) keys by design.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The testdata writes events.ts as TIMESTAMP(NANOS), which Spark's
    # vectorized parquet reader rejects; read as long and rebuild in catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(app_name: str = "epiteam-network-etl-functions-spark") -> SparkSession:
    """Build (or reuse) a local session sized from $SPARK_GRAFT_CPUS."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally provided session (driver smoke
    tests hand us their own SparkSession)."""
    for k, v in _RUNTIME_CONF.items():
        spark.conf.set(k, v)
    # Keep shuffle width sane on local sessions that kept the 200 default.
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) == 200:
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass
    return spark
