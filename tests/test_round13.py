"""Round-13 regression tests for the ADVICE r12 fixes.

1. ``parquet_py`` batch sink: a write where ALL partitions are empty
   must still commit a readable dataset (a zero-row shard carrying the
   writer's schema) — a manifest with no parquet files would fail
   spark.read.parquet schema inference.
2. ``global_row_number`` literal-offset guard sizes on the DENSE
   prefix-sum array (max pid + 1), not on the count of non-empty
   partitions, so sparse non-empty pids can't blow the codegen cap.
3. The products-of-sums overflow fixes (chi2 denominator, runs-test
   variance, GK-gamma cell products) keep their certified-SF values
   bit-identical: the double/decimal forms are exact below 2^53.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# parquet_py sink: all-empty write still commits a readable schema
# ---------------------------------------------------------------------------


def test_parquet_py_all_empty_write_preserves_schema(spark, tmp_path):
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (  # noqa: E501
        register_parquet_py_writer,
    )

    register_parquet_py_writer(spark)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("score", DoubleType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    empty = spark.createDataFrame([], schema).where(F.lit(False))
    out = str(tmp_path / "all_empty")
    os.makedirs(out)
    empty.write.format("parquet_py").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 0
    assert len(manifest["shards"]) == 1 and manifest["shards"][0][
        "n_rows"
    ] == 0

    back = spark.read.parquet(out)
    assert back.count() == 0
    assert {f.name: f.dataType for f in back.schema.fields} == {
        f.name: f.dataType for f in schema.fields
    }


def test_parquet_py_nonempty_write_unaffected(spark, tmp_path):
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (  # noqa: E501
        register_parquet_py_writer,
    )

    register_parquet_py_writer(spark)
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.5).alias("score")
    )
    out = str(tmp_path / "nonempty")
    os.makedirs(out)
    df.write.format("parquet_py").mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    # no synthetic empty shard when real shards exist
    assert all(s["shard"] != "part-empty.parquet" for s in manifest["shards"])
    assert spark.read.parquet(out).count() == 100


# ---------------------------------------------------------------------------
# global_row_number: sparse pids + in-plan overflow guard (r14 lazy form)
# ---------------------------------------------------------------------------


def test_rank_kernel_sparse_pids_still_rank_correctly(spark):
    """64 requested partitions over 500 rows leaves most pids empty — the
    in-plan offsets join must still produce the dense 1..500 ranking and
    the exact total."""
    from epiteam_network_etl_functions_spark.operators import winners

    df = spark.range(0, 500).select(
        (F.col("id") % 7).alias("v"), F.col("id").alias("uid")
    )
    ranked = winners.global_row_number(
        df, ["v", "uid"], "r", num_partitions=64, total_col="t"
    )
    rows = ranked.orderBy("r").collect()
    assert {row["t"] for row in rows} == {500}
    assert [row["r"] for row in rows] == list(range(1, 501))
    keys = [(row["v"], row["uid"]) for row in rows]
    assert keys == sorted(keys)


def test_rank_kernel_overflow_guard_is_in_plan(spark):
    """The 2^33-rows-per-partition guard must survive OPTIMIZATION (it
    lives inside the offset expression so Catalyst cannot prune it) —
    the pre-r14 driver-side RuntimeError is gone.

    Asserted on the OPTIMIZED logical plan, not the physical string:
    since the r15 offsets rewrite (windows → one higher-order
    `aggregate`), the guard sits in the aggregate's RESULT expression,
    and ObjectHashAggregate's toString prints aggregate functions and
    output attributes but not result expressions — the physical string
    hides an expression that is demonstrably still executed (the
    optimized plan shows it verbatim, post every pruning rule)."""
    from epiteam_network_etl_functions_spark.operators.winners import (
        global_row_number,
    )

    df = spark.range(0, 100).select(F.col("id").alias("v"))
    plan = (
        global_row_number(df, ["v"], "r")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "raise_error" in plan and "exceeds 2^33" in plan


# ---------------------------------------------------------------------------
# overflow-hardened statistics keep their certified values
# ---------------------------------------------------------------------------


def test_median_test_chi2_matches_pure_python(spark):
    """The double-led chi2 denominator must equal the exact integer
    computation at test scale (products < 2^53 are exact doubles)."""
    from epiteam_network_etl_functions_spark.workload.analytics17 import (
        median_test_customer_supplier,
    )

    row = median_test_customer_supplier(spark, SF_DIR).first()
    ca, cb = row["customer_above"], row["customer_below"]
    sa, sb = row["supplier_above"], row["supplier_below"]
    n = ca + cb + sa + sb
    expect = (
        n
        * (float(ca) * sb - float(cb) * sa) ** 2
        / (float(ca + cb) * (sa + sb) * (ca + sa) * (cb + sb))
    )
    assert abs(row["chi2"] - round(expect, 6)) <= 1e-9


def test_gk_gamma_pair_counts_exact(spark):
    """DECIMAL(38,0) accumulation must reproduce the exact integer pair
    counts (cross join double-counts, so both sums are even)."""
    from epiteam_network_etl_functions_spark.workload.analytics17 import (
        quantity_price_gk_gamma,
    )

    row = quantity_price_gk_gamma(spark, SF_DIR).first()
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    cells = (
        li.groupBy(
            F.least(
                F.floor((F.col("l_quantity") - 1) / 10).cast("long"),
                F.lit(4),
            ).alias("qbin"),
            F.least(
                F.floor(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    / 2000000
                ).cast("long"),
                F.lit(4),
            ).alias("pbin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    conc = disc = 0
    for a in cells:
        for b in cells:
            if (a["qbin"] < b["qbin"] and a["pbin"] < b["pbin"]) or (
                a["qbin"] > b["qbin"] and a["pbin"] > b["pbin"]
            ):
                conc += a["n"] * b["n"]
            elif (a["qbin"] < b["qbin"] and a["pbin"] > b["pbin"]) or (
                a["qbin"] > b["qbin"] and a["pbin"] < b["pbin"]
            ):
                disc += a["n"] * b["n"]
    assert conc % 2 == 0 and disc % 2 == 0
    assert row["concordant"] == conc // 2
    assert row["discordant"] == disc // 2


# ---------------------------------------------------------------------------
# multi-row-group footer audits (PLANS.md round-13 idea bank): byte-level
# layout facts SQL content queries can't see, so these stay pytest
# differentials against DuckDB parquet_metadata(), not driver queries
# ---------------------------------------------------------------------------


def _write_multi_rowgroup(tmp_path, rows_per_group=257):
    """Rewrite the orders table as one file with many bounded row
    groups (pyarrow row_group_size), the layout the compaction/census
    queries assume a writer can produce."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "orders_rg")
    os.makedirs(out)
    src = pq.read_table(os.path.join(SF_DIR, "orders.parquet"))
    pq.write_table(
        src, os.path.join(out, "part-0.parquet"),
        row_group_size=rows_per_group,
    )
    return out, src.num_rows


def _meta(spark, path):
    from epiteam_network_etl_functions_spark.sources.parquet_meta_datasource import (  # noqa: E501
        register_parquet_meta,
    )

    register_parquet_meta(spark)
    return spark.read.format("parquet_meta").option("path", path).load()


def test_rowgroup_size_histogram_matches_duckdb(spark, tmp_path):
    """Per-file row-group size list (the compaction planner's input)
    must match DuckDB's parquet_metadata() exactly on a file with many
    bounded row groups — a single-row-group assumption would collapse
    the histogram to one bucket."""
    import duckdb

    out, n_rows = _write_multi_rowgroup(tmp_path)
    ours = (
        _meta(spark, f"{out}/*.parquet")
        .select("file", "row_group", "rg_num_rows")
        .distinct()
        .collect()
    )
    got = sorted((r["row_group"], r["rg_num_rows"]) for r in ours)
    exp = sorted(
        duckdb.connect()
        .execute(
            f"""SELECT DISTINCT row_group_id, row_group_num_rows
                FROM parquet_metadata('{out}/*.parquet')"""
        )
        .fetchall()
    )
    assert got == exp
    assert len(got) > 5  # genuinely multi-row-group
    assert sum(n for _, n in got) == n_rows
    # bounded groups: every group but the last is exactly the cap
    assert {n for _, n in got[:-1]} == {257}


def test_rowgroup_zonemap_width_matches_duckdb(spark, tmp_path):
    """Per-row-group zone-map (min/max) width for a plain DOUBLE column
    must agree with DuckDB's footer stats on every group — the scan
    pruning estimate is only as good as per-group (not per-file)
    zone maps."""
    import duckdb

    out, _ = _write_multi_rowgroup(tmp_path)
    ours = {
        r["row_group"]: (r["min_double"], r["max_double"])
        for r in _meta(spark, f"{out}/*.parquet")
        .where(F.col("path_in_schema") == "o_totalprice")
        .collect()
    }
    theirs = {
        row[0]: (float(row[1]), float(row[2]))
        for row in duckdb.connect()
        .execute(
            f"""SELECT row_group_id, stats_min_value, stats_max_value
                FROM parquet_metadata('{out}/*.parquet')
                WHERE path_in_schema = 'o_totalprice'"""
        )
        .fetchall()
    }
    assert ours == theirs
    # per-group zone maps must be narrower than the whole-file span for
    # a sorted-ish write: at minimum, not every group spans the file
    widths = [mx - mn for mn, mx in ours.values()]
    file_min = min(mn for mn, _ in ours.values())
    file_max = max(mx for _, mx in ours.values())
    assert any(w < (file_max - file_min) for w in widths)


# ---------------------------------------------------------------------------
# streaming progress-listener audit (PLANS.md round-13 surface): the
# listener's accumulated numInputRows/numOutputRows must cross-foot with
# the source row count and the memory-sink table — the ops invariant a
# throughput/backlog health check asserts on
# ---------------------------------------------------------------------------


def test_streaming_listener_audit_cross_foots(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.listener import (
        ProgressAuditListener,
    )

    src_dir = str(tmp_path / "events_src")
    catalog.load(spark, SF_DIR, "events").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    n_src = spark.read.parquet(src_dir).count()

    listener = ProgressAuditListener({"listener_audit_out"})
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .select("event_id", "event_type")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("listener_audit_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert listener.wait_terminated(1, timeout_s=60)

        s = listener.summary("listener_audit_out")
        sink_rows = spark.sql(
            "SELECT count(*) AS n FROM listener_audit_out"
        ).first()["n"]
        # cross-foot: listener input == source table == listener output
        # == memory sink (append mode, no aggregation, nothing withheld)
        assert s["num_input_rows"] == n_src
        assert s["num_output_rows"] == n_src
        assert sink_rows == n_src
        assert s["n_batches"] >= 1
        assert "listener_audit_out" in listener.started
    finally:
        spark.streams.removeListener(listener)


def test_streaming_listener_state_rows_bounded(spark, tmp_path):
    """Stateful window agg: the listener's max_state_rows must be
    bounded by the number of distinct (window, type) groups — state
    growth is THE quantity a 100 TB streaming deployment alerts on."""
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.listener import (
        ProgressAuditListener,
    )

    src_dir = str(tmp_path / "events_state_src")
    catalog.load(spark, SF_DIR, "events").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    listener = ProgressAuditListener({"listener_state_out"})
    spark.streams.addListener(listener)
    try:
        agg = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "600 seconds"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("listener_state_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert listener.wait_terminated(1, timeout_s=60)

        n_groups = (
            catalog.load(spark, SF_DIR, "events")
            .groupBy(F.window("ts", "600 seconds"), "event_type")
            .count()
            .count()
        )
        s = listener.summary("listener_state_out")
        assert s["max_state_rows"] > 0
        assert s["max_state_rows"] <= n_groups
    finally:
        spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# overflow-frontier differentials: synthetic tables at sf1-scale row
# counts where the PRE-fix int64 products wrapped (Spark) or raised
# (DuckDB 'Overflow in multiplication of INT64') — the ADVICE r12 medium
# finding, proven at the frontier, not just below it
# ---------------------------------------------------------------------------


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(
            tuple(
                round(r[i], 9) if isinstance(r[i], float) else str(r[i])
                for i in order
            )
        )
    return sorted(out)


def test_median_test_chi2_at_sf1_scale(spark, tmp_path):
    """150k customers x 10k suppliers: the chi2 denominator product is
    ~9.6e18 > int64 max. The double-led form must run on BOTH engines
    and agree."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as m

    sf = str(tmp_path / "sf1ish")
    os.makedirs(sf)
    rng = np.random.RandomState(13)
    c = np.round(rng.uniform(-999.99, 9999.99, 150_000), 2)
    s = np.round(rng.uniform(1000.0, 9999.99, 10_000), 2)  # skewed high
    pq.write_table(
        pa.table({"c_acctbal": c}), os.path.join(sf, "customer.parquet")
    )
    pq.write_table(
        pa.table({"s_acctbal": s}), os.path.join(sf, "supplier.parquet")
    )

    from epiteam_network_etl_functions_spark.workload.analytics17 import (
        median_test_customer_supplier,
    )

    row = median_test_customer_supplier(spark, sf).first()
    ca, cb = row["customer_above"], row["customer_below"]
    sa, sb = row["supplier_above"], row["supplier_below"]
    denom = (ca + cb) * (sa + sb) * (ca + sa) * (cb + sb)
    assert denom > 2**63 - 1  # the frontier is genuinely exercised
    assert row["chi2"] is not None and row["chi2"] >= 0

    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    cur = con.execute(m.oracle_sql()["median_test_customer_supplier"])
    dcols = [c0[0] for c0 in cur.description]
    drows = cur.fetchall()
    assert _norm_rows(list(row.asDict().keys()), [tuple(row)]) == _norm_rows(
        dcols, drows
    )
    # negative proof: the PRE-fix all-BIGINT denominator raises on these
    # exact cell counts (the ADVICE r12 reproduction)
    import pytest

    with pytest.raises(Exception, match="[Oo]verflow"):
        con.execute(
            f"SELECT CAST({ca + cb} AS BIGINT) * {sa + sb} "
            f"* {ca + sa} * {cb + sb}"
        ).fetchall()


def test_runs_test_z_at_overflow_scale(spark, tmp_path):
    """One event type with 2.2M rows: (n1+n2)^2 * (n1+n2-1) ~ 1.06e19
    > int64 max — the pre-fix denominator wrapped (Spark) / raised
    (DuckDB). The double-led form must agree across engines."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as m

    sf = str(tmp_path / "sf_runs")
    os.makedirs(sf)
    n = 2_200_000
    rng = np.random.RandomState(7)
    values = np.round(rng.uniform(0.0, 100.0, n), 3)
    ts = pa.array(
        (np.arange(n, dtype="int64") * 1_000_000) + 1_700_000_000_000_000,
        type=pa.int64(),
    ).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype="int64")),
                "event_type": pa.array(["a"] * n),
                "ts": ts,
                "value": pa.array(values),
            }
        ),
        os.path.join(sf, "events.parquet"),
    )

    from epiteam_network_etl_functions_spark.workload.analytics17 import (
        value_runs_test,
    )

    rows = value_runs_test(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    nn = r["n1"] + r["n2"]
    assert nn * nn * (nn - 1) > 2**63 - 1  # frontier exercised
    assert r["z_stat"] is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    cur = con.execute(m.oracle_sql()["value_runs_test"])
    dcols = [c0[0] for c0 in cur.description]
    drows = cur.fetchall()
    assert _norm_rows(
        list(rows[0].asDict().keys()), [tuple(x) for x in rows]
    ) == _norm_rows(dcols, drows)


# ---------------------------------------------------------------------------
# RocksDB state store (bundled with Spark 4 — re-probed this round and
# it WORKS; the earlier JNI-jar assumption was wrong): the 100 TB state
# backend must produce bit-identical results to the default HDFS-backed
# provider on the repo's stateful streaming ops
# ---------------------------------------------------------------------------

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _run_stream_with_provider(spark, stream_df, name, provider, mode):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        if provider:
            spark.conf.set(key, provider)
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    return spark.sql(f"SELECT * FROM {name}")


def _stream_events(spark, tmp_path, sub):
    from epiteam_network_etl_functions_spark import catalog

    src = str(tmp_path / sub)
    catalog.load(spark, SF_DIR, "events").write.parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_rocksdb_state_store_parity_windowed_agg(spark, tmp_path):
    from epiteam_network_etl_functions_spark.streaming.windows import (
        streaming_bucket_counts,
    )

    agg1 = streaming_bucket_counts(_stream_events(spark, tmp_path, "e1"))
    agg2 = streaming_bucket_counts(_stream_events(spark, tmp_path, "e2"))
    base = _run_stream_with_provider(
        spark, agg1, "ss_default_out", None, "append"
    ).collect()
    rocks = _run_stream_with_provider(
        spark, agg2, "ss_rocks_out", _ROCKSDB, "append"
    ).collect()
    assert len(base) > 0
    assert sorted(map(tuple, base)) == sorted(map(tuple, rocks))


def test_rocksdb_state_store_parity_exact_dedup(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.dedup import (
        streaming_exact_dedup,
    )

    # documents + a synthetic event time (the dedup contract needs a
    # watermark column); write once, stream twice
    src = str(tmp_path / "docs_src")
    docs = catalog.load(spark, SF_DIR, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("ts"),
    )
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    n_distinct = docs.select("text").distinct().count()

    def run(name, provider):
        stream = spark.readStream.schema(schema).parquet(src)
        out = _run_stream_with_provider(
            spark, streaming_exact_dedup(stream), name, provider, "append"
        )
        # survivors are one per digest; which arrival wins is the
        # engine's pick, so compare the TEXT sets, not full rows
        return sorted(r["text"] for r in out.collect())

    base = run("dd_default_out", None)
    rocks = run("dd_rocks_out", _ROCKSDB)
    assert len(base) == n_distinct
    assert base == rocks
