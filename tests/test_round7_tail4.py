"""Invariant tests for the statistics/retrieval-fusion batch (oracle
parity lives in test_parity.py): Welch statistics against a SciPy-free
reference recomputation, Kaplan-Meier monotonicity + risk-set census,
RRF fusion arithmetic from the two input rankings, and ER pair symmetry
/ blocking containment."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.workload.temporal import (
    event_value_welch_test,
    wait_time_survival_curve,
)
from epiteam_network_etl_functions_spark.workload.tpch import (
    ER_LEV_MAX,
    customer_er_blocking_pairs,
)
from epiteam_network_etl_functions_spark.workload.vectors import (
    RRF_DEPTH,
    RRF_K,
    RRF_TOP_K,
    rrf_hybrid_search,
)
from tests.conftest import PARITY_SF_DIR


def test_welch_matches_two_pass_reference(spark):
    vals = {}
    for r in (
        spark.read.parquet(f"{PARITY_SF_DIR}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r.event_type, []).append(round(r.value * 1e6) / 1e6)
    stats = {}
    for t, xs in vals.items():
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        stats[t] = (n, m, v)
    rows = event_value_welch_test(spark, PARITY_SF_DIR).collect()
    types = sorted(vals)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        na, ma, va = stats[r.type_a]
        nb, mb, vb = stats[r.type_b]
        assert r.type_a < r.type_b
        assert (r.n_a, r.n_b) == (na, nb)
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        df = se2 * se2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        assert abs(r.welch_t - t) < 1e-3
        assert abs(r.welch_df - df) < max(1e-3 * df, 1e-3)
        # df bounds: min(na,nb)-1 <= df <= na+nb-2
        assert min(na, nb) - 1 - 1e-6 <= r.welch_df <= na + nb - 2 + 1e-6


def test_survival_curve_monotone_and_risk_census(spark):
    rows = sorted(
        wait_time_survival_curve(spark, PARITY_SF_DIR).collect(),
        key=lambda r: r.t_minutes,
    )
    assert rows, "curve must be non-degenerate at sf0.001"
    n_events_total = (
        spark.read.parquet(f"{PARITY_SF_DIR}/events.parquet").count()
    )
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert r.n_events >= 1
        assert r.n_events <= r.n_risk <= n_events_total
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9  # KM is non-increasing
        if prev_n is not None:
            assert r.n_risk < prev_n  # risk set strictly shrinks over t
        prev_s, prev_n = r.survival, r.n_risk
    # first step: S = 1 - d/n at the smallest event time
    f = rows[0]
    assert abs(f.survival - (1.0 - f.n_events / f.n_risk)) < 1e-6


def test_rrf_fusion_matches_input_rankings(spark):
    from epiteam_network_etl_functions_spark.workload.text import bm25_scores
    from epiteam_network_etl_functions_spark.workload.vectors import (
        QUERY_VEC_ID,
    )
    from epiteam_network_etl_functions_spark.operators.similarity import (
        as_double,
        cosine,
    )

    lex_rows = sorted(
        bm25_scores(spark, PARITY_SF_DIR).collect(),
        key=lambda r: (-r.bm25, r.doc_id),
    )[:RRF_DEPTH]
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex_rows)}

    e = spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).collect()[0].embedding
    scored = (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.round(
                cosine(
                    as_double(F.col("embedding")),
                    F.array(*[F.lit(float(x)) for x in q]),
                ),
                6,
            ).alias("cos"),
        )
        .collect()
    )
    sem_rows = sorted(scored, key=lambda r: (-r.cos, r.vec_id))[:RRF_DEPTH]
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(sem_rows)}

    rows = rrf_hybrid_search(spark, PARITY_SF_DIR).collect()
    assert 0 < len(rows) <= RRF_TOP_K
    for r in rows:
        rl = lex_rank.get(r.doc_id, -1)
        rs = sem_rank.get(r.doc_id, -1)
        assert (r.lex_rank, r.sem_rank) == (rl, rs)
        expect = (1.0 / (RRF_K + rl) if rl > 0 else 0.0) + (
            1.0 / (RRF_K + rs) if rs > 0 else 0.0
        )
        assert abs(r.rrf - round(expect, 6)) < 1e-9
    # a doc on BOTH lists must outrank a doc appearing on neither cut
    both = [r for r in rows if r.lex_rank > 0 and r.sem_rank > 0]
    if both:
        assert rows[0].rrf >= both[0].rrf or rows[0] is both[0]


def test_er_pairs_blocked_and_thresholded(spark):
    cust = {
        r.c_custkey: (r.c_nationkey, r.c_name)
        for r in spark.read.parquet(
            f"{PARITY_SF_DIR}/customer.parquet"
        ).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = customer_er_blocking_pairs(spark, PARITY_SF_DIR).collect()
    assert rows, "ER pairs must be non-degenerate at sf0.001"
    seen = set()
    for r in rows:
        assert r.custkey_a < r.custkey_b
        na, name_a = cust[r.custkey_a]
        nb, name_b = cust[r.custkey_b]
        assert na == nb == r.nationkey
        assert r.lev == lev(name_a, name_b) <= ER_LEV_MAX
        seen.add((r.custkey_a, r.custkey_b))
    # exhaustive within-block recount at this SF
    keys = sorted(cust)
    expect = set()
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            if cust[ka][0] == cust[kb][0] and lev(cust[ka][1], cust[kb][1]) <= ER_LEV_MAX:
                expect.add((ka, kb))
    assert seen == expect
