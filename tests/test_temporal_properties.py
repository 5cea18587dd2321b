"""Randomized differential tests: sessionize and asof vs naive in-memory
models (hypothesis; few examples since each round-trips Spark)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from epiteam_network_etl_functions_spark.operators.asof import asof_join_backward
from epiteam_network_etl_functions_spark.operators.sessions import sessionize

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50_000)),  # (user, offset secs)
    min_size=1,
    max_size=30,
    unique=True,
)

_slow = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(events_strategy)
@_slow
def test_sessionize_matches_naive(spark, events):
    rows = [
        Row(user_id=u, event_id=i, ts=BASE + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df, "user_id", "ts", "event_id", gap_seconds=3600).collect()
    }
    # naive model
    byuser: dict = {}
    for i, (u, s) in enumerate(events):
        byuser.setdefault(u, []).append((s, i))
    expected = {}
    for u, evs in byuser.items():
        sid, last = 0, None
        for s, i in sorted(evs):
            if last is None or s - last > 3600:
                sid += 1
            expected[(u, i)] = sid
            last = s
    assert got == expected


@given(events_strategy, st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50_000)), min_size=0, max_size=10, unique=True))
@_slow
def test_asof_matches_naive(spark, lefts, rights):
    # dedupe right (user, ts) pairs — the kernel's documented contract
    rmap: dict = {}
    for j, (u, s) in enumerate(rights):
        rmap[(u, s)] = max(rmap.get((u, s), -1), j)
    l_rows = [
        Row(lid=i, user_id=u, ts=BASE + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(lefts)
    ]
    r_rows = [
        Row(user_id=u, ts=BASE + dt.timedelta(seconds=s), rid=j)
        for (u, s), j in rmap.items()
    ]
    ldf = spark.createDataFrame(l_rows)
    if r_rows:
        rdf = spark.createDataFrame(r_rows)
    else:
        rdf = spark.createDataFrame([], "user_id long, ts timestamp, rid long")
    out = asof_join_backward(ldf, rdf, ["user_id"], "ts", ["rid"])
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    expected = {}
    for i, (u, s) in enumerate(lefts):
        best = None
        for (ru, rs), j in rmap.items():
            if ru == u and rs <= s and (best is None or rs > best[0] or (rs == best[0] and j > best[1])):
                best = (rs, j)
        expected[i] = best[1] if best else None
    assert got == expected


def test_asof_payload_columns_come_from_same_row(spark):
    # Right rows with NULLs in some payload columns: all asof_* outputs must
    # come from the single latest right row — a NULL there stays NULL, never
    # back-filled per-column from an older row.
    r_rows = [
        Row(user_id=1, ts=BASE, a="a0", b="b0"),
        Row(user_id=1, ts=BASE + dt.timedelta(seconds=10), a=None, b="b1"),
        Row(user_id=1, ts=BASE + dt.timedelta(seconds=20), a="a2", b=None),
    ]
    l_rows = [
        Row(lid=0, user_id=1, ts=BASE + dt.timedelta(seconds=15)),
        Row(lid=1, user_id=1, ts=BASE + dt.timedelta(seconds=25)),
    ]
    out = asof_join_backward(
        spark.createDataFrame(l_rows),
        spark.createDataFrame(r_rows),
        ["user_id"],
        "ts",
        ["a", "b"],
    )
    got = {r["lid"]: (r["asof_a"], r["asof_b"]) for r in out.collect()}
    assert got == {0: (None, "b1"), 1: ("a2", None)}
