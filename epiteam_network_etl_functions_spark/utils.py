"""Timing instrumentation (reference stopwatch.py:8-42 context managers +
:44-80 benchmark recorder table).

The recorder appends one row per program run to a parquet table instead of
a DuckDB side-database — an append-mode sink any engine can read back.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from datetime import datetime, timezone

from pyspark.sql import SparkSession


@contextmanager
def stopwatch(label: str, report=print):
    """Wall-clock a stage (stopwatch.py:8-20 report_til_here)."""
    t0 = time.perf_counter()
    report(f"[stopwatch] {label}: start")
    try:
        yield
    finally:
        report(f"[stopwatch] {label}: {time.perf_counter() - t0:.3f}s")


class Benchmark:
    """Append (program, start, end, elapsed) to a parquet log table
    (stopwatch.py:44-80 Benchmark.__enter__/__exit__)."""

    def __init__(self, spark: SparkSession, program: str, table_path: str):
        self.spark = spark
        self.program = program
        self.table_path = table_path

    def __enter__(self):
        self._t0 = time.perf_counter()
        self._start = datetime.now(timezone.utc)
        return self

    def __exit__(self, *exc):
        elapsed = time.perf_counter() - self._t0
        row = [
            (
                self.program,
                self._start.isoformat(),
                datetime.now(timezone.utc).isoformat(),
                float(elapsed),
            )
        ]
        df = self.spark.createDataFrame(
            row, ["program", "start_date", "end_date", "elapsed_time"]
        )
        df.write.mode("append").parquet(self.table_path)
        return False
