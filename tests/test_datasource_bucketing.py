"""Spark 4 Python DataSource (geojson) + bucketed-table co-located join."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from tests.conftest import PARITY_SF_DIR


def test_geojson_datasource(spark, tmp_path):
    from epiteam_network_etl_functions_spark.sources.geojson_datasource import (
        GeoJSONDataSource,
    )

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "f1",
                "properties": {"cve_geo": "09010"},
                "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]},
            },
            {
                "type": "Feature",
                "properties": {"cve_geo": "15020"},
                "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
            },
        ],
    }
    p = tmp_path / "cat.geojson"
    p.write_text(json.dumps(fc))

    spark.dataSource.register(GeoJSONDataSource)
    df = spark.read.format("geojson").load(str(p))
    rows = {r["feature_id"]: r for r in df.collect()}
    assert set(rows) == {"f1", "1"}
    assert rows["f1"]["geom_type"] == "Polygon"
    assert json.loads(rows["f1"]["properties"])["cve_geo"] == "09010"
    assert json.loads(rows["1"]["geometry"])["coordinates"] == [1.5, 2.5]


def test_bucketed_join_has_no_exchange(spark):
    """bucketBy co-locates both sides on the join key so the sort-merge join
    runs shuffle-free (the 100 TB recipe for repeatedly-joined fact tables)."""
    orders = catalog.load(spark, PARITY_SF_DIR, "orders")
    lineitem = catalog.load(spark, PARITY_SF_DIR, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # sanity: result matches the plain join
        assert joined.count() == lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
