"""Testdata catalog: the driver-provided parquet tables.

The reference inferred schemas everywhere (SURVEY.md §1.3); here table names
are explicit and reads are plain `spark.read.parquet` so Catalyst keeps
predicate pushdown + column pruning. Hive-partitioned layouts (reference
S2/S9, IndexingHomeAgebs.py:144-146) are handled in sources/io.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (session id, sf_dir, table) -> DataFrame. DataFrames are immutable plan
# handles; memoizing skips the per-call file listing + parquet footer read.
# Bounded: cleared wholesale past _LOAD_CACHE_MAX so stopped sessions'
# object graphs cannot accumulate in a long-lived process.
_LOAD_CACHE: dict[tuple, DataFrame] = {}
_LOAD_CACHE_MAX = 256


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if len(_LOAD_CACHE) > _LOAD_CACHE_MAX:
        _LOAD_CACHE.clear()
    sc = spark.sparkContext
    # applicationId+startTime is stable for the session's lifetime and can
    # never alias a new context the way a recycled id() could after GC.
    key = (sc.applicationId, sc.startTime, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong (session.py); truncate to
        # microseconds exactly as DuckDB does when it surfaces TIMESTAMP.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Plain µs/ms parquet written with isAdjustedToUTC=false surfaces as
    # TIMESTAMP_NTZ under Spark 4 inference; unix_micros()/window() require
    # TIMESTAMP. The session is pinned to UTC, so the cast is value-exact.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _LOAD_CACHE[key] = df
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for spark.sql workloads (reference §3.3 notebook pattern)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# Cache partitioning for a multi-query session: wide enough that map-heavy
# pipelines (md5 signatures, vector math) parallelize off the cached scan,
# narrow enough that task launch doesn't dominate at bench scale. At cluster
# scale the same call with bigger counts is the standard warm-cache pattern
# (spark.catalog.cacheTable before an interactive session).
#
# Entries are (n_partitions, cluster_key | None). A keyed entry caches the
# table HASH-PARTITIONED on its hot join/group key — the in-memory analog of
# bucketing the table at rest (the same layout argument as the bucketed
# co-location variant): InMemoryTableScan reports the child's
# outputPartitioning, so every join or aggregate on that key downstream is
# exchange-free. lineitem and orders share the orderkey domain at the SAME
# width, so lineitem⋈orders (the spine of every TPC-H shape) needs zero
# shuffles; events clusters on user_id, the partition key of the session /
# as-of / per-user-window family. Keys with uniform cardinality (orderkey,
# user_id) — hot-key skew would need salting instead.
CACHE_PARTS: dict[str, tuple[int, str | None]] = {
    "lineitem": (16, "l_orderkey"),
    "orders": (16, "o_orderkey"),
    "events": (8, "user_id"),
    # doc_id clustering: Generate/Project preserve the child's partitioning,
    # and HashPartitioning(doc_id) satisfies ClusteredDistribution over any
    # key set containing doc_id — so explode→groupBy(doc_id, term) and the
    # per-document rank windows all skip their exchange.
    "documents": (16, "doc_id"),
    "embeddings": (8, None),
    "customer": (2, None),
    "part": (2, None),
    "supplier": (1, None),
    "nation": (1, None),
    "region": (1, None),
}


def cache_tables(
    spark: SparkSession,
    sf_dir: str,
    parts: dict[str, tuple[int, str | None]] | None = None,
) -> None:
    """Materialize every table in memory once so a session running many
    queries (bench.py, notebooks) amortizes the parquet scan + decode across
    all of them. Subsequent ``load`` calls return the cached plans. Tables
    with a cluster key in ``parts`` are cached hash-partitioned on it (see
    CACHE_PARTS) so keyed joins/aggregates downstream skip their exchange."""
    parts = parts or CACHE_PARTS
    sc = spark.sparkContext
    for name in TABLE_NAMES:
        df = load(spark, sf_dir, name)
        n, key = parts.get(name, (4, None))
        part = df.repartition(n, F.col(key)) if key else df.repartition(n)
        cached = part.cache()
        cached.count()  # eager: all queries below should hit memory
        _LOAD_CACHE[(sc.applicationId, sc.startTime, sf_dir, name)] = cached
