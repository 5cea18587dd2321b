"""Closed-form differentials for the analytics17 statistics: run the
REAL query functions against tiny synthetic tables whose analytic
answers are known exactly — a second, independent check besides the
DuckDB hash parity (which could in principle share a mistake with the
oracle SQL, since both were written together)."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def a17(spark):
    from epiteam_network_etl_functions_spark.workload import analytics17

    return analytics17


def _write_events(spark, tmpdir, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, et, v, "{}") for (i, t, u, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return str(tmpdir)


def _write_orders(spark, tmpdir, month_rev):
    """month_rev: list of (year, month, totalprice) one order per month."""
    rows = [
        (i, 1, "O", price, datetime.datetime(y, m, 15), "1-URGENT")
        for i, (y, m, price) in enumerate(month_rev)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/orders.parquet")
    return str(tmpdir)


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)


def test_permutation_entropy_monotone_is_zero(spark, tmp_path, a17):
    # strictly increasing values -> single ordinal pattern -> entropy 0
    rows = [(i, _ts(i), 1, "click", float(i + 1)) for i in range(50)]
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_permutation_entropy(spark, d).collect()
    assert len(out) == 1
    assert out[0]["perm_entropy"] == 0.0
    assert out[0]["n_triples"] == 48


def test_permutation_entropy_alternating_is_ln2(spark, tmp_path, a17):
    # 1,2,1,2,... -> exactly two ordinal patterns; 40 values give 38
    # triples, 19 of each pattern -> entropy exactly ln 2
    rows = [
        (i, _ts(i), 1, "click", 1.0 if i % 2 == 0 else 2.0)
        for i in range(40)
    ]
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_permutation_entropy(spark, d).collect()[0]
    assert abs(out["perm_entropy"] - round(math.log(2), 6)) < 2e-6


def test_runs_test_alternating_maximal(spark, tmp_path, a17):
    # alternate strictly above/below the median -> n_runs == n
    rows = [
        (i, _ts(i), 1, "click", 10.0 if i % 2 == 0 else 1.0)
        for i in range(40)
    ]
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_runs_test(spark, d).collect()[0]
    assert out["n_runs"] == 40
    assert out["n1"] == out["n2"] == 20
    assert out["z_stat"] > 5  # far more runs than the null expects


def test_running_records_monotone_all_records(spark, tmp_path, a17):
    rows = [(i, _ts(i), 7, "view", float(i)) for i in range(12)]
    d = _write_events(spark, tmp_path, rows)
    out = {
        r["n_records"]: r["n_users"]
        for r in a17.value_running_records(spark, d).collect()
    }
    assert out == {12: 1}  # every event breaks the record


def test_mann_kendall_strictly_increasing(spark, tmp_path, a17):
    months = [(1995 + (m // 12), (m % 12) + 1, 100.0 * (m + 1)) for m in range(24)]
    d = _write_orders(spark, tmp_path, months)
    out = a17.monthly_revenue_mann_kendall(spark, d).collect()[0]
    n = 24
    assert out["s_stat"] == n * (n - 1) // 2  # every pair concordant
    assert out["z_stat"] > 0


def test_theil_sen_recovers_exact_linear_slope(spark, tmp_path, a17):
    # revenue = 250.00 dollars per month exactly -> every pairwise
    # slope equals 250, so the median does too
    months = [
        (1995 + (m // 12), (m % 12) + 1, 1000.0 + 250.0 * m)
        for m in range(20)
    ]
    d = _write_orders(spark, tmp_path, months)
    out = a17.monthly_revenue_theil_sen(spark, d).collect()[0]
    assert out["theil_sen_slope"] == 250.0
    assert out["n_pairs"] == 20 * 19 // 2


def test_gk_gamma_perfectly_concordant(spark, tmp_path, a17):
    # lineitem where quantity bin and price bin always agree -> gamma 1
    rows = [
        (i, i, 1, 1, float(1 + 10 * b), float((1 + 2 * b) * 10000),
         0.0, 0.0, "N", "O", datetime.datetime(1995, 1, 1))
        for b in range(5)
        for i in range(b * 10, b * 10 + 10)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = a17.quantity_price_gk_gamma(spark, str(tmp_path)).collect()[0]
    assert out["gk_gamma"] == 1.0
    assert out["discordant"] == 0


def test_diurnal_autocorr_uniform_profile_degenerate_guard(
    spark, tmp_path, a17
):
    # two opposite 12h blocks -> lag-12 rotation maps day onto night:
    # correlation exactly -1
    rows = []
    i = 0
    for day in range(3):
        for h in range(24):
            n = 3 if h < 12 else 1
            for _ in range(n):
                rows.append(
                    (
                        i,
                        datetime.datetime(2024, 1, 1 + day, h, 30),
                        1,
                        "click",
                        1.0,
                    )
                )
                i += 1
    d = _write_events(spark, tmp_path, rows)
    out = {
        r["lag_h"]: r["circ_autocorr"]
        for r in a17.diurnal_profile_autocorr(spark, d).collect()
    }
    assert out[12] == -1.0


def test_mutual_information_independent_is_zero(spark, tmp_path, a17):
    # counts perfectly uniform over (type, hour) -> MI exactly 0
    rows = []
    i = 0
    for et in ("a", "b"):
        for h in range(24):
            for _ in range(5):
                rows.append(
                    (i, datetime.datetime(2024, 1, 1, h, 15), 1, et, 1.0)
                )
                i += 1
    d = _write_events(spark, tmp_path, rows)
    out = a17.type_hour_mutual_information(spark, d).collect()[0]
    assert out["mutual_information"] == 0.0
    assert abs(out["h_type"] - round(math.log(2), 6)) < 2e-6
    assert abs(out["h_hour"] - round(math.log(24), 6)) < 2e-6


def test_mutual_information_deterministic_equals_entropy(
    spark, tmp_path, a17
):
    # each type occurs in exactly one hour -> I(type; hour) == H(type)
    rows = []
    i = 0
    for k, et in enumerate(("a", "b", "c", "d")):
        for _ in range(10):
            rows.append(
                (i, datetime.datetime(2024, 1, 1, k, 0), 1, et, 1.0)
            )
            i += 1
    d = _write_events(spark, tmp_path, rows)
    out = a17.type_hour_mutual_information(spark, d).collect()[0]
    assert abs(out["mutual_information"] - out["h_type"]) < 2e-6
    assert abs(out["mutual_information"] - round(math.log(4), 6)) < 2e-6


def test_levene_equal_variances_near_zero(spark, tmp_path, a17):
    # identical value multisets per type -> identical |dev| groups ->
    # between-group term exactly 0 -> W == 0
    rows = []
    i = 0
    for et in ("a", "b", "c"):
        for v in (1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0):
            rows.append((i, _ts(i), 1, et, v))
            i += 1
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_levene_variance_test(spark, d).collect()[0]
    assert out["levene_w"] == 0.0
    assert out["n_groups"] == 3


def test_two_way_anova_pure_interaction(spark, tmp_path, a17):
    # XOR design: main effects vanish, interaction dominates. Build
    # 2 weekdays x 2 types with cell means +d/-d in an XOR pattern and
    # tiny within-cell noise.
    rows = []
    i = 0
    # 2024-01-01 is a Monday (weekday 0), 2024-01-02 Tuesday (1)
    for day, dow in ((1, 0), (2, 1)):
        for et in ("a", "b"):
            base = 10.0 + (5.0 if (dow == 0) == (et == "a") else -5.0)
            for j in range(10):
                rows.append(
                    (
                        i,
                        datetime.datetime(2024, 1, day, 12, j),
                        1,
                        et,
                        base + (0.01 if j % 2 else -0.01),
                    )
                )
                i += 1
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_two_way_anova(spark, d).collect()[0]
    assert out["f_interaction"] > 1000 * max(out["f_dow"], out["f_type"])
    assert abs(out["f_dow"]) < 1e-6 and abs(out["f_type"]) < 1e-6


def test_cvar_closed_form(spark, tmp_path, a17):
    # 100 orders valued 1..100 in one segment: VaR95 interpolates to
    # 95.05; tail {96..100} -> CVaR = 98, n_tail = 5
    orders = spark.createDataFrame(
        [
            (i, 1, "O", float(i), datetime.datetime(1995, 1, 1), "1-URGENT")
            for i in range(1, 101)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    orders.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    customer.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    out = a17.segment_value_cvar(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["var95"] == 95.05
    assert r["n_tail"] == 5
    assert r["cvar95"] == 98.0


def test_hurst_persistent_trend_near_one(spark, tmp_path, a17):
    # a deterministic linear trend in hourly totals is maximally
    # persistent: R/S grows ~linearly with the window, so the two-point
    # slope approaches 1
    rows = []
    for i in range(512):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)
        rows.append((i, ts, 1, "click", float(i + 1)))
    d = _write_events(spark, tmp_path, rows)
    out = a17.value_hurst_rescaled_range(spark, d).collect()[0]
    assert out["n_hours"] == 512
    assert out["hurst"] > 0.9


def _write_embeddings(spark, tmpdir, rows):
    """rows: list of (vec_id, [floats], label)."""
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/embeddings.parquet"
    )
    return str(tmpdir)


def test_intrinsic_dim_on_a_line_is_one(spark, tmp_path, a17):
    # points on a 1-D manifold embedded in 8-D: x_i = t_i * v, with
    # t_i pseudo-uniform (seeded LCG) — the TWO-NN MLE assumes Poisson
    # sampling (deterministic equal/geometric spacing would make every
    # ratio constant and the estimate meaningless), under which mu
    # follows Pareto(d) and the MLE must recover d ~ 1 regardless of
    # the ambient 8 dimensions.
    v = [1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5, 0.25]
    state, ts = 12345, []
    for _ in range(400):
        state = (1103515245 * state + 12345) % (1 << 31)
        ts.append(state / float(1 << 31))
    rows = [
        (i, [t * 1000.0 * x for x in v], 0) for i, t in enumerate(sorted(ts))
    ]
    d = _write_embeddings(spark, tmp_path, rows)
    out = a17.embedding_intrinsic_dim_2nn(spark, d).collect()[0]
    assert out["n_used"] == 400
    assert 0.75 < out["intrinsic_dim"] < 1.35


def test_silhouette_and_db_on_separated_clusters(spark, tmp_path, a17):
    # two tight, far-apart clusters: silhouette near 1, DB near 0
    rows = []
    i = 0
    for label, center in ((0, 0.0), (1, 100.0)):
        for j in range(20):
            eps = 0.01 * (j - 10)
            rows.append((i, [center + eps] * 4, label))
            i += 1
    d = _write_embeddings(spark, tmp_path, rows)
    sil = {
        r["label"]: r["avg_silhouette"]
        for r in a17.label_silhouette_simplified(spark, d).collect()
    }
    assert all(s > 0.99 for s in sil.values())
    db = a17.label_davies_bouldin(spark, d).collect()[0]
    assert db["k_labels"] == 2
    assert db["davies_bouldin"] < 0.01


def test_f1_mcc_perfectly_separable(spark, tmp_path, a17):
    rows = []
    i = 0
    for label, center in ((0, 0.0), (1, 50.0), (2, 100.0)):
        for j in range(15):
            rows.append((i, [center + 0.1 * j] * 4, label))
            i += 1
    d = _write_embeddings(spark, tmp_path, rows)
    out = a17.nearest_centroid_f1_mcc(spark, d).collect()[0]
    assert out["macro_f1"] == 1.0
    assert out["mcc"] == 1.0


def test_triangle_audit_l2_zero_on_synthetic(spark, tmp_path, a17):
    rows = [
        (i, [float(i), float(i * i % 7), 1.0, -float(i)], 0)
        for i in range(30)
    ]
    d = _write_embeddings(spark, tmp_path, rows)
    out = a17.metric_triangle_audit(spark, d).collect()[0]
    assert out["l2_violations"] == 0
    assert out["n_triples"] == 28
