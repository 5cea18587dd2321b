"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries live in ``epiteam_network_etl_functions_spark.workload``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from epiteam_network_etl_functions_spark import workload

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry() -> tuple[dict, dict]:
    workload.load_all()
    return workload.REGISTRY, workload.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the co-location self-join (reference J1) at sf0.001."""
    registry, _ = _registry()
    return registry["colocation_pairs"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry, _ = _registry()
    return dict(registry)


def oracle_sql() -> dict[str, str]:
    _, oracles = _registry()
    return dict(oracles)
