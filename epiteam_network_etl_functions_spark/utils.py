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


_MEM_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_mem_bytes(s: str) -> int:
    """Parse a Spark memory string ('8g', '512m', '4096') to bytes."""
    s = s.strip().lower()
    for suf, mult in _MEM_SUFFIX.items():
        if s.endswith(suf + "b"):
            return int(float(s[:-2]) * mult)
        if s.endswith(suf):
            return int(float(s[:-1]) * mult)
    return int(float(s))


def sketch_agg_partitions(
    spark: SparkSession,
    n_keys: int,
    buffer_bytes: int = 32 * 1024,
    safety: int = 4,
    max_partitions: int = 32_768,
) -> int:
    """Shuffle width for a sketch-typed aggregation (HLL / theta / KLL
    UPDATABLE buffers, NOT their compact serialized form), derived from
    the actual heap instead of a constant — the SCALING.md r9 memory
    rule turned into code.

    A hash aggregate buffers one updatable sketch (~``buffer_bytes``)
    per distinct key in the task's partition, so a task needs
    ``n_keys / partitions * buffer_bytes`` bytes of aggregation space.
    This solves for the partition count that keeps that under
    (execution memory / concurrent tasks / safety): execution memory =
    heap * spark.memory.fraction; heap = spark.executor.memory when
    set, else the live JVM's Runtime.maxMemory() (local mode: the
    driver heap IS the executor heap).

    Raises with the knob named when even ``max_partitions`` cannot fit
    the buffers — the explicit-degradation contract: a 100 TB job
    should fail telling the operator to raise spark.executor.memory or
    shrink lgConfigK, not OOM mid-shuffle.
    """
    conf_mem = None
    try:
        conf_mem = spark.conf.get("spark.executor.memory")
    except Exception:
        pass
    if conf_mem:
        heap = parse_mem_bytes(conf_mem)
    else:
        heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    try:
        fraction = float(spark.conf.get("spark.memory.fraction", "0.6"))
    except Exception:
        fraction = 0.6
    cores = max(1, spark.sparkContext.defaultParallelism)
    per_task = heap * fraction / cores / safety
    if per_task <= buffer_bytes:
        raise RuntimeError(
            "sketch_agg_partitions: execution memory per task "
            f"({per_task:.0f} B) cannot hold even one updatable sketch "
            f"buffer ({buffer_bytes} B) — raise spark.executor.memory or "
            "lower the sketch's lgConfigK"
        )
    need = int(-(-(n_keys * buffer_bytes) // per_task))  # ceil
    width = max(cores * 2, need)
    if width > max_partitions:
        raise RuntimeError(
            f"sketch_agg_partitions: {n_keys} keys x {buffer_bytes} B "
            f"updatable buffers need {width} partitions at the current "
            f"heap (> cap {max_partitions}) — raise spark.executor.memory "
            "or lower the sketch's lgConfigK"
        )
    return width


def drain_available_now(query, tmp_dir: str | None = None, timeout: int = 300) -> None:
    """Block until an availableNow streaming query fully drains.

    `StreamingQuery.awaitTermination(timeout)` returns False on timeout
    without raising; reading the memory sink at that point silently
    yields plausible-looking undercounts on a loaded host. Raise
    instead. Also removes the query's scratch dir (re-landed source
    parquet + checkpoint) so repeated sweeps/bench runs don't leak
    /tmp disk — the memory sink holds its rows driver-side, so the
    files are not needed after the drain.
    """
    import shutil

    try:
        if not query.awaitTermination(timeout):
            query.stop()
            raise RuntimeError(
                f"streaming query {query.name!r} did not drain "
                f"within {timeout}s; refusing to read a partial sink"
            )
    finally:
        if tmp_dir is not None:
            shutil.rmtree(tmp_dir, ignore_errors=True)


def process_all_available(query, timeout: int = 300) -> None:
    """processAllAvailable with a deadline. The call itself has no
    timeout parameter and blocks forever if a custom source stalls —
    unacceptable inside a driver run that executes hundreds of queries
    sequentially. Runs it on a watchdog thread; on expiry the query is
    stopped and the failure surfaces instead of hanging the harness."""
    import threading

    done = threading.Event()
    err: list[BaseException] = []

    def _wait():
        try:
            query.processAllAvailable()
        except BaseException as e:  # noqa: BLE001 - surfaced below
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=_wait, daemon=True)
    t.start()
    if not done.wait(timeout):
        query.stop()
        raise RuntimeError(
            f"streaming query {query.name!r} did not process all available "
            f"data within {timeout}s; stopped instead of hanging"
        )
    if err:
        raise err[0]
