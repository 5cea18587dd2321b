"""GeoJSON catalog seeding + polygon cell cover (reference S6/F5-F7)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.plans.mobility import (
    cells_to_regions_dim,
    locate_pings,
)
from epiteam_network_etl_functions_spark.sources.geojson import (
    feature_collection_to_catalog,
    polygon_bbox_cells,
)

FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"cve_geo": "09010", "nom_agem": "Alpha"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[-99.1, 19.0], [-99.0, 19.0], [-99.0, 19.1],
                                 [-99.1, 19.1], [-99.1, 19.0]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"cve_geo": "15020", "nom_agem": "Beta"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[-98.6, 19.5], [-98.5, 19.5], [-98.5, 19.6],
                                 [-98.6, 19.6], [-98.6, 19.5]]],
            },
        },
    ],
}


def test_catalog_flatten(spark):
    cat = feature_collection_to_catalog(spark, FC)
    rows = {r["cve_geo"]: r for r in cat.collect()}
    assert set(rows) == {"09010", "15020"}
    geom = json.loads(rows["09010"]["geometry"])
    assert geom["type"] == "Polygon"


def test_polygon_cover_and_locate(spark):
    cat = feature_collection_to_catalog(spark, FC)
    covered = cat.rdd.map(
        lambda r: (r["cve_geo"], list(polygon_bbox_cells(r["geometry"], res=7)))
    ).collect()
    dim_src = spark.createDataFrame(
        [Row(cve_geo=k, cells=v) for k, v in covered]
    )
    dim = cells_to_regions_dim(dim_src)
    assert dim.count() >= 2

    # a ping inside Alpha's box must attribute to 09010
    from epiteam_network_etl_functions_spark.functions.hexgrid import _fallback_cell

    ping_cell = _fallback_cell(19.05, -99.05, 7)
    pings = spark.createDataFrame([Row(caid="A", h3index_15=ping_cell)])
    out = locate_pings(pings, dim).collect()[0]
    assert out["cve_geo"] == "09010"
