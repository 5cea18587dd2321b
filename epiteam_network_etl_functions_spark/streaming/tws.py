"""transformWithStateInPandas (Spark 4's StatefulProcessor API) —
implemented and test-armed, ENVIRONMENT-BLOCKED in this container.

The modern replacement for applyInPandasWithState (which
streaming/stateful.py certifies): typed state handles (ValueState /
ListState / MapState), timers, and initial-state hydration. The
processor below is the running per-key totals kernel — the simplest
shape that exercises ValueState round-trips and update-mode emission.

BLOCKER: the PySpark TWS driver worker imports google.protobuf for its
state-server protocol; this container ships a broken protobuf
('cannot import name descriptor'), so the query crashes at
initialization (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The
armed lock tests/test_tws.py runs the full differential the first time
an environment with a working protobuf appears — the same discipline as
the real-h3 parity lock (tests/test_hexgrid_h3.py). No driver query is
registered: it would fail identically in the driver's environment.

Requires the RocksDB state store provider
(spark.sql.streaming.stateStore.providerClass), set by
:func:`running_totals_stream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # the import itself is safe; only query EXECUTION needs protobuf
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - absent only on ancient pyspark
    StatefulProcessor = object  # type: ignore[assignment,misc]

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (n, cents) totals in a ValueState. Counters are
    monotone, so update-mode re-emissions recover the final value as
    max() per key — the stream_update_mode_counts recovery pattern."""

    def init(self, handle):
        self._st = handle.getValueState("totals", "n LONG, cents LONG")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._st.exists():
            n, cents = self._st.get()
        else:
            n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        self._st.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "cents": [cents]}
        )

    def close(self):
        pass


def running_totals_stream(stream: DataFrame) -> DataFrame:
    """Wire the processor to a (user_id, cents) stream. The caller owns
    the sink; TWS requires the RocksDB state store, set here on the
    stream's session (runtime conf, picked up at query start)."""
    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
    )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType="user_id long, n long, cents long",
        outputMode="Update",
        timeMode="None",
    )
