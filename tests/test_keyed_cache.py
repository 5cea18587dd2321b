"""catalog.cache_tables keyed layout: a table cached hash-partitioned on
its hot key must make downstream joins/aggregates on that key
exchange-free (the in-memory bucketing analog, PLANS.md round 7).

Plan-asserted so a regression (a repartition dropped, a Catalyst change
that stops InMemoryTableScan from reporting outputPartitioning) fails
loudly instead of silently re-widening the TPC-H spine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _restore_catalog(spark):
    """cache_tables pins keyed InMemoryRelations into catalog._LOAD_CACHE
    for the whole session; evict them afterwards so later tests see plain
    parquet scans again (plan-shape tests assert on the uncached form)."""
    yield
    sc = spark.sparkContext
    for name in catalog.TABLE_NAMES:
        key = (sc.applicationId, sc.startTime, SF_DIR, name)
        df = catalog._LOAD_CACHE.pop(key, None)
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges_above_cache(plan: str) -> int:
    """Count Exchange nodes EXCLUDING those nested inside an
    InMemoryRelation (the cache-build repartition itself) and any
    ReusedExchange. Indent-aware: a cache-build subtree is every line
    indented deeper than its InMemoryRelation header, so exchanges above
    a LATER cached scan (e.g. only the right join side regressing) are
    still counted — a first-match break would miss them."""

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*"))

    n = 0
    cache_depth: int | None = None
    for line in plan.splitlines():
        d = indent(line)
        if cache_depth is not None and d <= cache_depth:
            cache_depth = None  # dedented out of the cache-build subtree
        if cache_depth is None and "InMemoryRelation" in line:
            cache_depth = d
            continue
        if cache_depth is not None:
            continue  # inside a cache-build subtree
        if "ReusedExchange" in line:
            continue
        if "Exchange" in line and "BroadcastExchange" not in line:
            n += 1
    return n


def test_orderkey_join_is_exchange_free(spark):
    catalog.cache_tables(spark, SF_DIR)
    li = catalog.load(spark, SF_DIR, "lineitem")
    o = catalog.load(spark, SF_DIR, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderkey"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(joined)
    assert "InMemoryTableScan" in plan
    # join on the cluster key + groupBy on it: zero exchanges above the
    # cached scans (the join reads both caches' hashpartitioning directly)
    assert _exchanges_above_cache(plan) == 0, plan
    assert joined.count() > 0


def test_offkey_join_still_shuffles(spark):
    """Sanity inverse: a join on a NON-cluster key must still exchange —
    the assertion helper is measuring real plan structure, not vacuous."""
    catalog.cache_tables(spark, SF_DIR)
    o = catalog.load(spark, SF_DIR, "orders")
    c = catalog.load(spark, SF_DIR, "customer").limit(10**6)  # defeat broadcast estimate
    joined = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert _exchanges_above_cache(_plan(joined)) >= 1


def test_doc_groupby_is_exchange_free(spark):
    catalog.cache_tables(spark, SF_DIR)
    d = catalog.load(spark, SF_DIR, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # HashPartitioning(doc_id) satisfies clustering on (doc_id, term):
    # explode preserves partitioning, the aggregate needs no exchange
    assert _exchanges_above_cache(_plan(tf)) == 0
    assert tf.count() > 0
