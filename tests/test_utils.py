"""Stopwatch + benchmark recorder (reference stopwatch.py, S14)."""

from __future__ import annotations

from epiteam_network_etl_functions_spark.utils import Benchmark, stopwatch


def test_stopwatch_reports():
    lines = []
    with stopwatch("stage-x", report=lines.append):
        pass
    assert lines[0] == "[stopwatch] stage-x: start"
    assert lines[1].startswith("[stopwatch] stage-x: ")


def test_benchmark_appends_rows(spark, tmp_path):
    path = str(tmp_path / "benchlog")
    with Benchmark(spark, "prog-a", path):
        pass
    with Benchmark(spark, "prog-b", path):
        pass
    log = spark.read.parquet(path)
    assert log.count() == 2
    assert set(log.columns) == {"program", "start_date", "end_date", "elapsed_time"}
    assert log.where("elapsed_time >= 0").count() == 2
