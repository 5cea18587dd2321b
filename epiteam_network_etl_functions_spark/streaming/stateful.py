"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.10); this is the extension
surface for a live feed: a per-device session tracker that maintains
(session count, last-seen timestamp) as typed state and emits one row per
closed session — the stateful analog of operators/sessions.py.

State is bounded two ways: one fixed-width row per device, AND an
event-time timeout that flushes a device's open session once the watermark
passes last_event + gap (the session can never be extended after that), so
devices that stop sending do not retain state forever.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

GAP_US = 3600 * 1_000_000


def _naive_utc(us: int) -> dt.datetime:
    # session timezone is pinned to UTC (session.py); TimestampType columns
    # carry naive datetimes interpreted as UTC.
    return dt.datetime.fromtimestamp(us / 1e6, tz=dt.timezone.utc).replace(tzinfo=None)


def _track(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        session_no, n_events, start_us, last_us = state.get
    else:
        session_no, n_events, start_us, last_us = 0, 0, None, None
    closed = []
    if state.hasTimedOut:
        # Watermark passed last_us + gap: the open session can never gain
        # another event — emit it as closed and drop the state row so an
        # idle device costs nothing.
        if last_us is not None:
            closed.append((user_id, session_no, n_events, start_us, last_us))
        state.remove()
    else:
        # Drain ALL chunks before segmenting: a group's rows can arrive
        # across multiple unordered Arrow batches, and per-chunk sorting
        # would mis-segment sessions when a later chunk holds earlier
        # timestamps.
        all_ts = []
        for pdf in pdf_iter:
            all_ts.extend(pdf["ts"])
        for ts in sorted(all_ts):
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None:
                session_no, n_events, start_us = session_no + 1, 1, us
            elif us - last_us > GAP_US:
                closed.append((user_id, session_no, n_events, start_us, last_us))
                session_no, n_events, start_us = session_no + 1, 1, us
            else:
                n_events += 1
            last_us = us
        state.update((session_no, n_events, start_us, last_us))
        # gap-sized event-time timeout (milliseconds epoch)
        state.setTimeoutTimestamp((last_us + GAP_US) // 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_no": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "start_ts": [_naive_utc(c[3]) for c in closed],
                "end_ts": [_naive_utc(c[4]) for c in closed],
            }
        )


def streaming_session_tracker(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Emit closed sessions per device from a (user_id, ts) stream. State is
    one fixed-width row per device, flushed by event-time timeout once the
    watermark passes last_event + gap — bounded even when devices go dark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
