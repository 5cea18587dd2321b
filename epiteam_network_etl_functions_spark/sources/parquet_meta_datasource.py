"""Parquet footer-metadata table as a Spark 4 Python DataSource.

A lakehouse engine needs its file layout to be queryable: row-group
sizing, per-column compression, and zone-map (min/max) coverage drive
compaction plans, Z-ordering, and scan-cost estimates (the reference
re-reads whole parquet stages between steps, e.g.
src/transforms/parquet_extractor.py:42, without ever inspecting layout;
at 100 TB the layout IS a first-class table). DuckDB exposes this as
``parquet_metadata()``; here the equivalent is a Python DataSource:

    spark.dataSource.register(ParquetMetaDataSource)
    spark.read.format("parquet_meta").load("/data/sf/*.parquet")

One input partition per FILE — footers are O(KB) reads, so a
1000-executor cluster fans out one footer fetch per task with no data
scan at all. Rows are one per (row group, column chunk).

The numeric min/max stats are surfaced as doubles only for physical
INT32/INT64/FLOAT/DOUBLE chunks whose logical type is plain (no
timestamp/decimal reinterpretation) — exactly the chunks where a
zone-map comparison against SQL ``min()/max()`` is well defined; the
driver-certified query ``footer_stats_content_parity`` locks footer
stats against content aggregates computed by both engines.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PARQUET_META_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),  # basename
        StructField("dir", StringType(), True),  # parent dir basename
        #   (partition dirs like lang=en surface here for hive layouts)
        StructField("row_group", IntegerType(), False),
        StructField("rg_num_rows", LongType(), False),
        StructField("rg_total_bytes", LongType(), False),
        StructField("column_id", IntegerType(), False),
        StructField("path_in_schema", StringType(), False),
        StructField("physical_type", StringType(), False),
        StructField("logical_type", StringType(), True),
        StructField("num_values", LongType(), False),
        StructField("null_count", LongType(), True),
        StructField("compressed_bytes", LongType(), False),
        StructField("uncompressed_bytes", LongType(), False),
        StructField("min_double", DoubleType(), True),
        StructField("max_double", DoubleType(), True),
    ]
)

_PLAIN_NUMERIC = {"INT32", "INT64", "FLOAT", "DOUBLE"}


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _resolve_paths(options) -> list[str]:
    paths = options.get("paths")
    if paths:
        out = [p for p in paths.split(",") if p]
    else:
        path = options.get("path")
        if not path:
            raise ValueError("parquet_meta source requires path or paths")
        if os.path.isdir(path):
            out = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not out:  # hive layout: one level of partition dirs
                out = sorted(
                    glob.glob(os.path.join(path, "*", "*.parquet"))
                )
        else:
            out = sorted(glob.glob(path)) or [path]
    if not out:
        raise ValueError(f"parquet_meta: no files matched {options}")
    return out


class ParquetMetaReader(DataSourceReader):
    def __init__(self, options):
        self.paths = _resolve_paths(options)

    def pushFilters(self, filters):
        """FILTER PUSHDOWN (the Python DataSource API's pruning hook):
        ``file = '...'`` / ``file IN (...)`` predicates prune the path
        list BEFORE partition planning, so a query over one table's
        footer fetches exactly one footer — on a 100 TB catalog with
        thousands of files this is the difference between one metadata
        read and a fleet-wide sweep. Handled filters are consumed
        (Spark drops its own re-check); everything else is returned
        as unsupported and evaluated by Spark."""
        from pyspark.sql.datasource import EqualTo, In

        unsupported = []
        for f in filters:
            wanted = None
            if isinstance(f, EqualTo) and f.attribute == ("file",):
                wanted = {f.value}
            elif isinstance(f, In) and f.attribute == ("file",):
                wanted = set(f.value)
            if wanted is None:
                unsupported.append(f)
                continue
            self.paths = [
                p for p in self.paths if os.path.basename(p) in wanted
            ]
        return unsupported

    def partitions(self):
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition):
        # worker-side import: the footer read happens on executors
        import pyarrow.parquet as pq

        path = partition.path
        md = pq.ParquetFile(path).metadata
        base = os.path.basename(path)
        parent = os.path.basename(os.path.dirname(path)) or None
        schema = md.schema
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                col = rg.column(c_i)
                logical = schema.column(c_i).logical_type.type
                stats = col.statistics
                mn = mx = None
                if (
                    stats is not None
                    and stats.has_min_max
                    and col.physical_type in _PLAIN_NUMERIC
                    and logical in ("NONE", "INT")
                ):
                    mn, mx = float(stats.min), float(stats.max)
                yield (
                    base,
                    parent,
                    rg_i,
                    rg.num_rows,
                    rg.total_byte_size,
                    c_i,
                    col.path_in_schema,
                    col.physical_type,
                    logical,
                    col.num_values,
                    stats.null_count if stats is not None else None,
                    col.total_compressed_size,
                    col.total_uncompressed_size,
                    mn,
                    mx,
                )


class ParquetMetaDataSource(DataSource):
    @classmethod
    def name(cls):
        return "parquet_meta"

    def schema(self):
        return PARQUET_META_SCHEMA

    def reader(self, schema):
        return ParquetMetaReader(self.options)


def register_parquet_meta(spark) -> None:
    """Idempotent registration (re-register is a no-op error we swallow
    because Spark keeps the first registration). Also enables Python
    DataSource filter pushdown on THIS session: a reader that implements
    pushFilters raises at plan time when the conf is off, and
    getOrCreate may have handed us a session built before the engine's
    correctness conf was applied (e.g. a hostile driver session)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    try:
        spark.dataSource.register(ParquetMetaDataSource)
    except Exception:
        pass
