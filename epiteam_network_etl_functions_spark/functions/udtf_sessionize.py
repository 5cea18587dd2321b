"""Spark 4 Python UDTF with a TABLE argument: per-user sessionization.

The n-gram UDTF (udtf_ngrams.py) covers the scalar-arguments UDTF
surface; this module covers the OTHER half of the API — a UDTF fed a
``TABLE(...) PARTITION BY ... ORDER BY ...`` argument, where the engine
routes each partition's rows through one instance in order and calls
``terminate()`` at partition end. That is Spark's modern replacement for
the reference's collect-then-groupby-apply session logic
(src/transforms/ntl_transforms.py row-wise handlers): state lives in the
UDTF instance, rows stream through Arrow batches, and the shuffle is the
only data movement.

PRODUCTION NOTE: gap sessionization is expressible with built-in window
functions (lag + cumulative sum — see the ``user_sessions`` query), and
that JVM form is the hot path. The UDTF form exists for logic that
genuinely cannot be a window expression (e.g. dynamic gap thresholds
that depend on running session state); ``udtf_session_stats`` certifies
it against the SQL form, so the two can never drift.

Sessions close when the gap to the previous event exceeds
``GAP_SECONDS`` (strictly greater, matching the SQL oracle's
``gap > INTERVAL``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

GAP_SECONDS = 1800  # 30 minutes, the user_sessions query's threshold


@udtf(
    returnType=(
        "user_id: bigint, session_start_us: bigint, session_end_us: bigint,"
        " n_events: bigint"
    )
)
class SessionizeUdtf:
    """Emit one row per closed session of a (PARTITION BY user_id
    ORDER BY ts) event stream. Timestamps are surfaced as integer
    microseconds — exact, engine-neutral arithmetic (the workload
    formats for display downstream)."""

    def __init__(self):
        self._user = None
        self._start_us = None
        self._last_us = None
        self._n = 0

    def _flush(self):
        if self._n:
            yield self._user, self._start_us, self._last_us, self._n

    def eval(self, row):
        user = row["user_id"]
        ts = row["ts"]
        # TimestampType arrives as datetime; exact integer microseconds
        us = (
            int(ts.timestamp() * 1_000_000)
            if not isinstance(ts, int)
            else ts
        )
        if self._user is not None and (
            user != self._user
            or us - self._last_us > GAP_SECONDS * 1_000_000
        ):
            yield from self._flush()
            self._user = None
        if self._user is None:
            self._user = user
            self._start_us = us
            self._n = 0
        self._last_us = us
        self._n += 1

    def terminate(self):
        yield from self._flush()


def register_sessionize_udtf(
    spark: SparkSession, name: str = "sessionize"
) -> None:
    spark.udtf.register(name, SessionizeUdtf)
