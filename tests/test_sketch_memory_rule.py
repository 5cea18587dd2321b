"""The SCALING.md r9 sketch-buffer memory rule as code
(utils.sketch_agg_partitions): shuffle width for sketch-typed
aggregations derived from the heap, with explicit degradation."""

from __future__ import annotations

import pytest

from epiteam_network_etl_functions_spark.utils import (
    parse_mem_bytes,
    sketch_agg_partitions,
)


def test_parse_mem_bytes():
    assert parse_mem_bytes("8g") == 8 << 30
    assert parse_mem_bytes("512m") == 512 << 20
    assert parse_mem_bytes("1024k") == 1 << 20
    assert parse_mem_bytes("4096") == 4096
    assert parse_mem_bytes("2GB") == 2 << 30


def test_width_scales_with_keys(spark):
    small = sketch_agg_partitions(spark, 1_000)
    # floor: at least 2x parallelism even for tiny key counts
    assert small >= 2 * spark.sparkContext.defaultParallelism
    big_keys = 20_000_000
    big = sketch_agg_partitions(spark, big_keys)
    assert big >= small
    # the width actually covers the buffer budget: keys/width x 32 KB
    # fits under heap x fraction / cores / safety
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    per_task = heap * 0.6 / max(1, spark.sparkContext.defaultParallelism) / 4
    assert big_keys / big * 32 * 1024 <= per_task * 1.01


def test_explicit_degradation_names_the_knob(spark):
    with pytest.raises(RuntimeError, match="spark.executor.memory"):
        sketch_agg_partitions(spark, 10**15, max_partitions=1024)


def test_two_hop_sketched_runs_with_derived_width(spark):
    """The consumer query still produces its histogram with the derived
    width (rows-only surface: shape + non-emptiness is its contract)."""
    from epiteam_network_etl_functions_spark.workload import analytics9

    df = analytics9.two_hop_reach_sketched(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    assert {c for c in df.columns} == {"log2_reach_bucket", "n_nodes"}
    assert all(r["n_nodes"] > 0 for r in rows)
