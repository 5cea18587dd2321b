"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.10); this is the extension
surface for a live feed: a per-device session tracker that maintains
(session count, last-seen timestamp) as typed state and emits one row per
closed session — the stateful analog of operators/sessions.py.
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


def _track(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        session_no, n_events, start_us, last_us = state.get
    else:
        session_no, n_events, start_us, last_us = 0, 0, None, None
    closed = []
    # Drain ALL chunks before segmenting: a group's rows can arrive across
    # multiple unordered Arrow batches, and per-chunk sorting would
    # mis-segment sessions when a later chunk holds earlier timestamps.
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
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_no": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "start_ts": [dt.datetime.utcfromtimestamp(c[3] / 1e6) for c in closed],
                "end_ts": [dt.datetime.utcfromtimestamp(c[4] / 1e6) for c in closed],
            }
        )


def streaming_session_tracker(stream: DataFrame) -> DataFrame:
    """Emit closed sessions per device from a (user_id, ts) stream. State is
    one fixed-width row per device — bounded, shuffle-partitioned by key."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
