"""Randomized differential tests for the round-5 kernels vs naive
in-memory models (hypothesis; few examples since each round-trips Spark):
time-RANGE trailing frames, ordered sequences, sole-late-supplier
decorrelation, and fixed-round label propagation."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, Window, functions as F

BASE = dt.datetime(2024, 1, 1)

_slow = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),          # user
        st.integers(0, 10_000),     # offset seconds (ties allowed)
        st.integers(0, 500),        # value cents
    ),
    min_size=1,
    max_size=30,
)


@given(events_strategy)
@_slow
def test_trailing_range_frame_matches_naive(spark, events):
    """RANGE BETWEEN 3600s PRECEDING: every row's frame is all rows of the
    same user with ts in [t-3600, t] INCLUDING same-timestamp peers."""
    rows = [
        Row(user_id=u, event_id=i, ts=BASE + dt.timedelta(seconds=s), vc=v)
        for i, (u, s, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    got = {
        r["event_id"]: (r["n"], r["s"])
        for r in df.select(
            "event_id",
            F.count("vc").over(w).alias("n"),
            F.sum("vc").over(w).alias("s"),
        ).collect()
    }
    for i, (u, s, v) in enumerate(events):
        frame = [
            v2
            for (u2, s2, v2) in events
            if u2 == u and s - 3600 <= s2 <= s
        ]
        assert got[i] == (len(frame), sum(frame)), (i, u, s)


@given(events_strategy)
@_slow
def test_sequence_order_is_total(spark, events):
    """array_sort over (ts, event_id, type) structs after collect_list must
    equal the python sort by (ts, event_id) regardless of shuffle order."""
    types = ["a", "b", "c"]
    rows = [
        Row(
            user_id=u,
            event_id=i,
            ts=BASE + dt.timedelta(seconds=s),
            event_type=types[v % 3],
        )
        for i, (u, s, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows).repartition(7)  # scramble
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    got = {
        r["user_id"]: r["seq"]
        for r in df.groupBy("user_id").agg(seq.alias("seq")).collect()
    }
    expected: dict = {}
    for i, (u, s, v) in enumerate(events):
        expected.setdefault(u, []).append((s, i, types[v % 3]))
    for u, evs in expected.items():
        assert got[u] == ">".join(t for _, _, t in sorted(evs))


@given(
    st.lists(
        st.tuples(st.integers(1, 20), st.integers(1, 4), st.booleans()),
        min_size=1,
        max_size=25,
    )
)
@_slow
def test_sole_late_decorrelation_matches_bruteforce(spark, items):
    """sole-late = (order, supplier) late pairs where the order has >1
    distinct supplier overall and NO other late supplier — the explicit
    semi+exactly-one rewrite must equal the quantified definition."""
    # (orderkey, suppkey, late?) lineitems
    rows = [
        Row(l_orderkey=o, l_suppkey=sk, late=lt) for (o, sk, lt) in items
    ]
    df = spark.createDataFrame(rows)
    late = df.where("late").select("l_orderkey", "l_suppkey").distinct()
    multi = (
        df.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("ns"))
        .where("ns > 1")
        .select("l_orderkey")
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nl"), F.max("l_suppkey").alias("l_suppkey"))
        .where("nl = 1")
        .select("l_orderkey", "l_suppkey")
        .join(multi, "l_orderkey", "left_semi")
    )
    got = {(r["l_orderkey"], r["l_suppkey"]) for r in sole.collect()}
    # brute force from the definition
    late_set = {(o, sk) for (o, sk, lt) in items if lt}
    sups = {}
    for o, sk, _ in items:
        sups.setdefault(o, set()).add(sk)
    expected = {
        (o, sk)
        for (o, sk) in late_set
        if len(sups[o]) > 1
        and not any(sk2 != sk for (o2, sk2) in late_set if o2 == o)
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
@_slow
def test_label_propagation_two_rounds_matches_naive(spark, pairs):
    """Two synchronous rounds of most-frequent-neighbour-label (ties to
    smallest) vs a direct python model on the same undirected graph."""
    from epiteam_network_etl_functions_spark.plans.pagerank import (
        label_propagation,
    )

    edges = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r["node_id"]: r["label"]
        for r in label_propagation(df, max_iter=2).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(2):
        new = {}
        for n in adj:
            counts: dict = {}
            for m in adj[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        if new == labels:  # same early-stop as the kernel
            break
        labels = new
    assert got == labels


@given(
    st.lists(  # (orderkey, qty) lineitems
        st.tuples(st.integers(1, 15), st.integers(1, 100)),
        min_size=1,
        max_size=30,
    ),
    st.integers(50, 150),  # threshold
)
@_slow
def test_having_in_semi_join_rewrite_matches_bruteforce(spark, items, thr):
    """Q18's IN-over-grouped-HAVING as an explicit semi join: surviving
    rows must be exactly those of orders whose total quantity > thr."""
    df = spark.createDataFrame(items, "l_orderkey long, qty long")
    big = (
        df.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sq"))
        .where(F.col("sq") > thr)
        .select("l_orderkey")
    )
    got = sorted(
        map(tuple, df.join(big, "l_orderkey", "left_semi").collect())
    )
    totals: dict = {}
    for o, q in items:
        totals[o] = totals.get(o, 0) + q
    expected = sorted((o, q) for o, q in items if totals[o] > thr)
    assert got == expected


@given(
    st.lists(  # (custkey, balance_cents)
        st.tuples(st.integers(1, 10), st.integers(-500, 500)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.lists(st.integers(1, 10), max_size=10),  # custkeys with recent orders
)
@_slow
def test_scalar_cutoff_anti_join_matches_bruteforce(spark, custs, recent):
    """Q22's scalar-avg cutoff + NOT EXISTS as broadcast cross join +
    left-anti: survivors are exactly the above-positive-average customers
    with no recent order."""
    c = spark.createDataFrame(custs, "c_custkey long, bal long")
    o = spark.createDataFrame([(k,) for k in recent], "o_custkey long")
    cutoff = c.where("bal > 0").agg(F.avg("bal").alias("cut"))
    got = {
        r["c_custkey"]
        for r in c.crossJoin(F.broadcast(cutoff))
        .where(F.col("bal") > F.col("cut"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .collect()
    }
    pos = [b for _, b in custs if b > 0]
    if not pos:
        assert got == set()
        return
    cut = sum(pos) / len(pos)
    expected = {
        k for k, b in custs if b > cut and k not in set(recent)
    }
    assert got == expected
