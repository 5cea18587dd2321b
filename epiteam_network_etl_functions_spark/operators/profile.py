"""Table profiling + small-file compaction — curation-pipeline utilities
(beyond-reference surface; the reference's analog is its logged per-stage
sanity counts, e.g. NetworkBuilder.py:83-84, SURVEY.md §5).

- `table_profile`: per-column null/distinct/min/max stats for a set of
  columns in ONE aggregation pass over the table (a long-format quality
  report). At 100 TB the exact multi-column COUNT(DISTINCT) is the
  expensive term (Spark plans it as an Expand — one input replica per
  distinct aggregate); `exact=False` switches every distinct count to a
  one-pass HLL sketch, the only shape that scales past ~10 columns.
- `compact`: rewrite a parquet directory into size-targeted files. Every
  long-running ingest accretes small files (per-trigger commits,
  per-partition task outputs); scans then pay per-file open/footer costs
  that dwarf the data read. Classic maintenance op; sizes the output by
  the actual on-disk byte count, not file count.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def table_profile(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Long-format profile: one row per column with n_rows, n_nonnull,
    n_distinct, min_val, max_val (min/max cast to string AFTER aggregation,
    so numeric semantics are preserved and the output schema is uniform).

    One aggregation over one scan of the input — never a join or re-scan
    per column. Physical shape: exact mode plans the multi-column
    COUNT(DISTINCT) as an Expand (one input replica per distinct column,
    two exchanges — dedup by (value, gid), then the global finalize);
    approx mode is the genuine single-exchange one-pass plan, because HLL
    sketches merge map-side like any other partial aggregate. NULLs:
    n_nonnull counts them out; min/max of an all-NULL column is NULL.
    """
    distinct = F.countDistinct if exact else (
        lambda c: F.approx_count_distinct(c, 0.02)
    )
    aggs = [F.count(F.lit(1)).alias("__nrows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = ", ".join(
        f"'{c}', __nrows, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {rows}) AS "
        "(column_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"
    )


def profile_oracle_sql(table: str, cols: Sequence[str]) -> str:
    """The DuckDB mirror of :func:`table_profile` (exact mode): one
    UNION ALL branch per column."""
    parts = [
        f"SELECT '{c}' AS column_name, count(*) AS n_rows,"
        f" count({c}) AS n_nonnull, count(DISTINCT {c}) AS n_distinct,"
        f" CAST(min({c}) AS VARCHAR) AS min_val,"
        f" CAST(max({c}) AS VARCHAR) AS max_val FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_path`` (parquet) into ``dst_path`` with files sized
    toward ``target_file_mb``. Returns the output file count.

    File count = ceil(on-disk bytes / target): derived from the source's
    actual compressed size (listed via Hadoop FS, no data read), which is
    the right proxy because parquet re-written at similar encoding lands
    near its input size. Uses round-robin repartition (not coalesce):
    coalesce merges *within* existing partitions and inherits their skew;
    compaction's whole point is evenly sized outputs."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    it = fs.listFiles(path, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_path).repartition(n).write.mode("overwrite").parquet(
        dst_path
    )
    return n
