#!/usr/bin/env python
"""Stage-boundary floor decomposition for the standing >2x queries.

VERDICT r8 'What's wrong #1-2': the five queries that stay >2x the DuckDB
oracle at sf0.1 on idle hosts carry plans already at their minimal
exchange count — the claim is that the residual is Spark's per-stage
scheduling floor, not data movement. This probe turns that claim into
numbers:

1. CALIBRATION: a K-chained-repartition job over 32 rows measures the
   pure per-stage-boundary latency (no data time to speak of) — the
   slope of wall vs K is the floor per boundary on this host.
2. DECOMPOSITION: each query runs warm under a UI-enabled session; the
   REST API (/api/v1) yields its stages' durations and executorRunTime.
   ideal_data_s = sum(executorRunTime)/cores is what the work would cost
   at perfect parallelism; floor_s = wall - ideal_data_s is scheduling +
   serialization + stage-gap overhead; n_stages x calibrated slope
   cross-checks it.
3. The DuckDB oracle runs in-process on the same host for the ratio.

Usage: python tools/probe_floor.py [query ...]  (default: the five weak)
Prints a markdown table for PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WEAK = [
    "tfidf_top_terms",
    "late_shipment_orders",
    "top_unshipped_orders",
    "top_return_customers",
    "colocation_pairs",
]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stages_between(base: str, app: str, t0_ms: float, t1_ms: float):
    out = []
    for st in _rest(f"{base}/api/v1/applications/{app}/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # times are ISO 'yyyy-MM-ddTHH:mm:ss.SSSGMT'
        import datetime as dt

        def p(s):
            return dt.datetime.strptime(
                s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
            ).timestamp() * 1000

        t_sub = p(st["submissionTime"])
        t_done = p(st["completionTime"]) if st.get("completionTime") else None
        if t_done is None or t_sub < t0_ms - 50 or t_done > t1_ms + 50:
            continue
        out.append(
            {
                "dur_ms": t_done - t_sub,
                "run_ms": st.get("executorRunTime", 0),
                "tasks": st.get("numCompleteTasks", 0),
            }
        )
    return out


def _bench_builder(ui: bool):
    """The bench.py session shape (small profile, narrow shuffles,
    uncompressed shuffle, arrow) with the UI optionally enabled."""
    from pyspark.sql import SparkSession
    from epiteam_network_etl_functions_spark.session import (
        _SMALL_CORE_CONF,
        _profile_conf,
    )

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", os.environ["SPARK_GRAFT_SHUFFLE"])
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.ui.port", "4059")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in _profile_conf().items():
        b = b.config(k, v)
    for k, v in _SMALL_CORE_CONF.items():
        b = b.config(k, v)
    return b


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "1")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    import duckdb

    import __spark_entry__ as entrymod
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.session import prep

    names = sys.argv[1:] or WEAK
    spark = _bench_builder(ui=True).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)
    catalog.cache_tables(spark, SF_DIR)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    # -- calibration: per-job and per-stage-boundary latency ----------------
    one = spark.range(1).localCheckpoint()

    def job_floor() -> float:
        t0 = time.perf_counter()
        one.count()
        return time.perf_counter() - t0

    def chain(k: int) -> float:
        df = spark.range(0, 32, 1, 32)
        for i in range(k):
            df = df.repartition(33 + i)
        t0 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0

    chain(3)  # warm codegen/scheduler
    jf = min(job_floor() for _ in range(7))
    walls = {k: min(chain(k) for _ in range(5)) for k in (2, 12)}
    slope_ms = (walls[12] - walls[2]) / 10 * 1000
    print(
        f"calibration: trivial-job round-trip {jf*1e3:.0f} ms; "
        f"chained-repartition wall K=2 {walls[2]*1e3:.0f} ms, "
        f"K=12 {walls[12]*1e3:.0f} ms -> per-extra-stage "
        f"~{slope_ms:.0f} ms on {CPUS} cores"
    )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {CPUS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    rows = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.count()  # warm: plan + broadcast + page cache
        best = None
        for _ in range(3):
            t0 = time.time() * 1000
            w0 = time.perf_counter()
            df.count()
            wall = time.perf_counter() - w0
            t1 = time.time() * 1000
            if best is None or wall < best[0]:
                best = (wall, t0, t1)
        wall, t0, t1 = best
        stages = _stages_between(base, app, t0, t1)
        run_ms = sum(s["run_ms"] for s in stages)
        dbest = None
        for _ in range(3):
            d0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            d = time.perf_counter() - d0
            dbest = d if dbest is None else min(dbest, d)
        rows[name] = {
            "ui_wall": wall,
            "stages": len(stages),
            "ideal": run_ms / 1000.0 / CPUS,
            "duck": dbest,
        }
    spark.stop()

    # -- honest walls: fresh session, UI off (the bench configuration) ------
    spark2 = _bench_builder(ui=False).getOrCreate()
    spark2.sparkContext.setLogLevel("ERROR")
    prep(spark2)
    catalog.cache_tables(spark2, SF_DIR)
    spark2.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        df = qs[name](spark2, SF_DIR)
        df.count()
        rows[name]["wall"] = min(
            _timed(df.count) for _ in range(3)
        )
    spark2.stop()

    print(
        "\n| query | wall s (UI off) | stages | ideal-data s | floor s |"
        " floor/wall | duck s | wall/duck | data/duck |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name in names:
        r = rows[name]
        floor = r["wall"] - r["ideal"]
        print(
            f"| {name} | {r['wall']:.3f} | {r['stages']} | {r['ideal']:.3f} |"
            f" {floor:.3f} | {floor/r['wall']:.0%} | {r['duck']:.3f} |"
            f" {r['wall']/r['duck']:.2f} | {r['ideal']/r['duck']:.2f} |"
        )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
