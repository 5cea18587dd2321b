"""Real-H3 parity locks for the hexgrid UDFs (reference F1-F4,
ntl_transforms.py:64-65).

These tests run ONLY when the `h3` package is installed (pytest reports
them as skipped, not passed, otherwise). They pin cell_of / cell_centroid /
grid_distance / k_ring to the real H3 API so installing h3 in a production
image cannot silently change pipeline output: if the library's behaviour or
our call into it drifts, these fail rather than the fallback grid masking
it.
"""

from __future__ import annotations

import pytest

h3 = pytest.importorskip("h3")

from pyspark.sql import Row, functions as F  # noqa: E402

from epiteam_network_etl_functions_spark.functions.hexgrid import (  # noqa: E402
    HAVE_H3,
    cell_centroid,
    cell_of,
    grid_distance,
    k_ring,
)

# (lat, lon): CDMX zócalo, reference's home turf; equator/antimeridian edges
POINTS = [(19.4326, -99.1332), (0.0, 0.0), (-33.8688, 151.2093), (64.13, -21.82)]
RES = 9


def test_have_h3_flag_tracks_library():
    assert HAVE_H3 is True


@pytest.mark.parametrize("lat,lon", POINTS)
def test_cell_of_matches_latlng_to_cell(spark, lat, lon):
    df = spark.createDataFrame([Row(lat=float(lat), lon=float(lon))])
    got = df.select(cell_of("lat", "lon", RES).alias("cell")).collect()[0]["cell"]
    assert got == h3.latlng_to_cell(lat, lon, RES)


def test_cell_centroid_matches_cell_to_latlng(spark):
    cells = [h3.latlng_to_cell(lat, lon, RES) for lat, lon in POINTS]
    df = spark.createDataFrame([Row(cell=c) for c in cells])
    rows = df.select(
        "cell", cell_centroid("cell").alias("pt")
    ).collect()
    for r in rows:
        exp_lat, exp_lon = h3.cell_to_latlng(r["cell"])
        assert r["pt"]["lat"] == pytest.approx(exp_lat, abs=1e-9)
        assert r["pt"]["lon"] == pytest.approx(exp_lon, abs=1e-9)


def test_grid_distance_matches_h3(spark):
    a = h3.latlng_to_cell(*POINTS[0], RES)
    near = h3.latlng_to_cell(POINTS[0][0] + 0.002, POINTS[0][1], RES)
    df = spark.createDataFrame([Row(a=a, b=near), Row(a=a, b=a)])
    rows = {(r["a"], r["b"]): r["d"] for r in df.select(
        "a", "b", grid_distance("a", "b").alias("d")).collect()}
    assert rows[(a, near)] == h3.grid_distance(a, near)
    assert rows[(a, a)] == 0


def test_k_ring_matches_grid_disk(spark):
    cell = h3.latlng_to_cell(*POINTS[0], RES)
    df = spark.createDataFrame([Row(cell=cell)])
    got = df.select(k_ring("cell", 2).alias("ring")).collect()[0]["ring"]
    assert sorted(got) == sorted(h3.grid_disk(cell, 2))
    assert cell in got  # includes the origin, like the reference's k_ring
