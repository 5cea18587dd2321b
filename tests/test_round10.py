"""Round-10 unit tests: the distributed global-rank kernel and the
analytics10 query family's non-oracle invariants (the oracle parity gate
lives in tests/test_parity.py / tools/verify_driver.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from epiteam_network_etl_functions_spark.operators.winners import (
    global_row_number,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# global_row_number kernel
# ---------------------------------------------------------------------------


def test_global_row_number_matches_window(spark):
    """Kernel ranks == single-partition window ranks on skewed data with
    duplicate order keys (tie-break column makes the order total)."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("uid")
    )
    got = global_row_number(df, ["k", "uid"], "r")
    ref = df.withColumn(
        "r_ref", F.row_number().over(Window.orderBy("k", "uid")).cast("long")
    )
    j = got.join(ref, ["k", "uid"])
    assert j.where(F.col("r") != F.col("r_ref")).count() == 0
    assert got.count() == 5_000


def test_global_row_number_is_permutation(spark):
    df = spark.range(0, 1_000).select((F.col("id") * 7 % 1_000).alias("v"))
    got = global_row_number(df, ["v"], "r")
    row = got.agg(
        F.min("r").alias("lo"),
        F.max("r").alias("hi"),
        F.countDistinct("r").alias("n"),
    ).first()
    assert (row["lo"], row["hi"], row["n"]) == (1, 1_000, 1_000)


def test_global_row_number_no_single_partition_sort(spark):
    """The DATA path must never be globally sorted on one partition — the
    entire point of the kernel. The input is range-partitioned and sorted
    within partitions; the only SinglePartition exchange allowed is the
    r14 in-plan prefix-sum over the O(partitions) per-pid counts."""
    df = spark.range(0, 10_000).select(F.col("id").alias("v"))
    plan = global_row_number(df, ["v"], "r")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    # global sorts print as "Sort [...], true, 0" — none anywhere
    assert ", true, 0" not in plan
    # exactly one SinglePartition exchange (the counts prefix-sum), and it
    # must consume the counts HashAggregate, never the data
    assert plan.count("Exchange SinglePartition") == 1
    below = plan[plan.index("Exchange SinglePartition"):]
    nxt_exchange = below.index("Exchange", 1)
    assert "HashAggregate" in below[:nxt_exchange]


def test_global_row_number_respects_width(spark):
    df = spark.range(0, 1_000).select(F.col("id").alias("v"))
    got = global_row_number(df, ["v"], "r", num_partitions=7)
    assert got.count() == 1_000


# ---------------------------------------------------------------------------
# analytics10 invariants (shape/math properties the oracle can't see)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def a10():
    from epiteam_network_etl_functions_spark.workload import analytics10

    return analytics10


def test_pareto_shares_monotone(spark, a10):
    rows = {
        r["pct"]: r for r in a10.user_value_pareto(spark, SF).collect()
    }
    assert set(rows) == {1, 5, 10, 25}
    assert (
        rows[1]["value_share"]
        <= rows[5]["value_share"]
        <= rows[10]["value_share"]
        <= rows[25]["value_share"]
        <= 1.0
    )
    # top-k% of users must hold at least k% of value (sorted descending)
    for pct, r in rows.items():
        assert r["value_share"] * 100 >= pct * 0.999


def test_rank_deciles_partition_the_orders(spark, a10):
    rows = a10.order_price_rank_deciles(spark, SF).collect()
    assert {r["decile"] for r in rows} == set(range(10))
    # decile price ranges must be non-overlapping and increasing
    by_d = sorted(rows, key=lambda r: r["decile"])
    for lo, hi in zip(by_d, by_d[1:]):
        assert lo["hi_price"] <= hi["lo_price"]


def test_session_gap_sensitivity_monotone(spark, a10):
    rows = {
        r["gap_seconds"]: r
        for r in a10.session_gap_sensitivity(spark, SF).collect()
    }
    # a larger gap threshold can only merge sessions
    assert rows[900]["n_sessions"] >= rows[1800]["n_sessions"]
    assert rows[1800]["n_sessions"] >= rows[3600]["n_sessions"]


def test_jsd_symmetric_bounded(spark, a10):
    import math

    rows = a10.source_jsd_matrix(spark, SF).collect()
    assert len(rows) == 190  # C(20,2)
    for r in rows:
        assert 0.0 <= r["jsd"] <= math.log(2.0) + 1e-9
        assert r["src_a"] < r["src_b"]


def test_ivf_probe_sweep_monotone(spark, a10):
    rows = {r["nprobe"]: r for r in a10.ivf_probe_sweep(spark, SF).collect()}
    assert rows[1]["total_candidates"] <= rows[2]["total_candidates"]
    assert rows[2]["total_candidates"] <= rows[4]["total_candidates"]
    assert rows[4]["corpus_share"] <= 1.0


def test_concurrency_histogram_conserves_endpoints(spark, a10):
    """Histogram weights sum to the endpoint count: 2 per session."""
    from epiteam_network_etl_functions_spark.workload.temporal import (
        _session_endpoints,
    )

    hist = a10.concurrency_histogram(spark, SF)
    total = hist.agg(F.sum("n_endpoints")).first()[0]
    assert total == _session_endpoints(spark, SF).count()
