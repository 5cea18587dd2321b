"""table_profile + compact (operators/profile.py)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.operators.profile import (
    compact,
    table_profile,
)
from tests.conftest import PARITY_SF_DIR


def test_profile_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "id bigint, tag string",
    )
    rows = {r["column_name"]: r for r in table_profile(df, ["id", "tag"]).collect()}
    assert rows["id"]["n_rows"] == 4
    assert rows["id"]["n_nonnull"] == 3
    assert rows["id"]["n_distinct"] == 3
    assert rows["id"]["min_val"] == "1" and rows["id"]["max_val"] == "3"
    assert rows["tag"]["n_nonnull"] == 3
    assert rows["tag"]["n_distinct"] == 2
    assert rows["tag"]["min_val"] == "a" and rows["tag"]["max_val"] == "b"


def test_profile_plan_shape(spark):
    """One aggregation over one scan — never a per-column join/re-scan.
    Exact mode: the standard Expand multi-distinct plan (2 exchanges,
    1 file scan). Approx mode: a true one-pass single-exchange plan."""
    docs = catalog.load(spark, PARITY_SF_DIR, "documents")
    exact = (
        table_profile(docs, ["doc_id", "lang"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert exact.count("Exchange") == 2
    assert exact.count("FileScan") == 1
    assert "Join" not in exact
    approx = (
        table_profile(docs, ["doc_id", "lang"], exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert approx.count("Exchange") == 1
    assert approx.count("FileScan") == 1
    assert "Join" not in approx


def test_profile_approx_mode(spark):
    docs = catalog.load(spark, PARITY_SF_DIR, "documents")
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in table_profile(docs, ["lang", "source"]).collect()
    }
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in table_profile(docs, ["lang", "source"], exact=False).collect()
    }
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(2, 0.1 * n)


def test_compact_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    events = catalog.load(spark, PARITY_SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    events.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32
    n = compact(spark, src, dst, target_file_mb=1024)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    a = events.agg(F.count(F.lit(1)), F.sum("value")).collect()[0]
    b = (
        spark.read.parquet(dst)
        .agg(F.count(F.lit(1)), F.sum("value"))
        .collect()[0]
    )
    assert a[0] == b[0]
    assert abs(a[1] - b[1]) < 1e-6
