"""h3lite (pure-python hex lattice with the H3 API surface) — exact
lattice invariants, the python-vs-SQL differential on BOTH engines, and
the Spark hex UDF family that routes through the _h3 call sites."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from epiteam_network_etl_functions_spark.functions import h3lite
from epiteam_network_etl_functions_spark.functions.hexgrid import (
    HAVE_H3,
    hex_cell_centroid,
    hex_cell_of,
    hex_grid_distance,
    hex_k_ring,
)

RES = 9
POINTS = [
    (19.4326, -99.1332),  # CDMX zócalo, reference home turf
    (0.0, 0.0),
    (-33.8688, 151.2093),
    (64.13, -21.82),
    (19.0000001, -99.4999999),
]


def test_disk_size_is_hexagonal():
    c = h3lite.latlng_to_cell(19.43, -99.13, RES)
    for k in range(5):
        assert len(h3lite.grid_disk(c, k)) == 1 + 3 * k * (k + 1)
    assert c in h3lite.grid_disk(c, 2)


def test_disk_is_exactly_the_distance_ball():
    c = h3lite.latlng_to_cell(19.43, -99.13, RES)
    for k in (1, 2, 3):
        disk = set(h3lite.grid_disk(c, k))
        ball = {d for d in h3lite.grid_disk(c, k + 2) if h3lite.grid_distance(c, d) <= k}
        assert disk == ball


def test_distance_metric_properties():
    cells = [h3lite.latlng_to_cell(lat, lon, RES) for lat, lon in POINTS[:4]]
    for a in cells:
        assert h3lite.grid_distance(a, a) == 0
        for b in cells:
            assert h3lite.grid_distance(a, b) == h3lite.grid_distance(b, a)
            for c in cells:
                assert h3lite.grid_distance(a, c) <= (
                    h3lite.grid_distance(a, b) + h3lite.grid_distance(b, c)
                )


def test_neighbors_are_at_distance_one():
    c = h3lite.latlng_to_cell(19.43, -99.13, RES)
    ring1 = [d for d in h3lite.grid_disk(c, 1) if d != c]
    assert len(ring1) == 6
    assert all(h3lite.grid_distance(c, d) == 1 for d in ring1)


def test_centroid_round_trips_to_same_cell():
    for lat, lon in POINTS:
        cell = h3lite.latlng_to_cell(lat, lon, RES)
        clat, clon = h3lite.cell_to_latlng(cell)
        assert h3lite.latlng_to_cell(clat, clon, RES) == cell


def test_sql_text_matches_python_in_duckdb():
    """The shared SQL expression reproduces latlng_to_cell bit-for-bit —
    this is what lets a pings query run hex semantics under the oracle."""
    con = duckdb.connect()
    expr = h3lite.axial_sql_exprs("lat", "lon", RES)
    for lat, lon in POINTS:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT CAST(? AS DOUBLE) lat, CAST(? AS DOUBLE) lon)",
            [lat, lon],
        ).fetchone()[0]
        assert got == h3lite.latlng_to_cell(lat, lon, RES), (lat, lon)


def test_sql_text_matches_python_in_spark(spark):
    expr = h3lite.axial_sql_exprs("lat", "lon", RES)
    df = spark.createDataFrame([Row(lat=float(a), lon=float(o)) for a, o in POINTS])
    rows = df.selectExpr("lat", "lon", f"{expr} AS cell").collect()
    for r in rows:
        assert r["cell"] == h3lite.latlng_to_cell(r["lat"], r["lon"], RES)


def test_sql_steps_match_python_both_engines(spark):
    """The STAGED form (axial_sql_steps — what the production hex query
    and its DuckDB oracle actually run) pins to latlng_to_cell on both
    engines, so a drift in any step text cannot pass the gates."""
    steps = h3lite.axial_sql_steps("lat", "lon", RES)
    # Spark: sequential projections
    df = spark.createDataFrame([Row(lat=float(a), lon=float(o)) for a, o in POINTS])
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    for r in df.collect():
        assert r["cell"] == h3lite.latlng_to_cell(r["lat"], r["lon"], RES)
    # DuckDB: nested SELECTs over the same step exprs
    con = duckdb.connect()
    # string->double casts: bare literals parse as DECIMAL, whose
    # DOUBLE conversion can differ from python's float by ulps (see
    # test_h3lite_properties.test_sql_differential_random_points)
    vals = ", ".join(
        f"(CAST('{lat!r}' AS DOUBLE), CAST('{lon!r}' AS DOUBLE))"
        for lat, lon in POINTS
    )
    inner = f"SELECT lat, lon FROM (VALUES {vals}) AS t(lat, lon)"
    for name, expr in steps:
        inner = f"SELECT *, {expr} AS {name} FROM ({inner})"
    for lat, lon, *rest in con.execute(inner).fetchall():
        assert rest[-1] == h3lite.latlng_to_cell(float(lat), float(lon), RES)


@pytest.mark.skipif(HAVE_H3, reason="hex UDFs route to real h3 when installed")
def test_hex_udfs_execute_h3lite_through_spark(spark):
    """The _h3.* call sites (latlng_to_cell / cell_to_latlng /
    grid_distance / grid_disk) execute inside Arrow-batched UDFs — the
    plumbing the square fallback used to leave dead."""
    df = spark.createDataFrame([Row(lat=float(a), lon=float(o)) for a, o in POINTS])
    cells = df.select(
        "lat", "lon", hex_cell_of("lat", "lon", RES).alias("cell")
    )
    rows = cells.collect()
    for r in rows:
        assert r["cell"] == h3lite.latlng_to_cell(r["lat"], r["lon"], RES)

    ringed = cells.select(
        "cell",
        hex_k_ring("cell", 2).alias("ring"),
        hex_cell_centroid("cell").alias("pt"),
    ).collect()
    for r in ringed:
        assert sorted(r["ring"]) == sorted(h3lite.grid_disk(r["cell"], 2))
        assert len(r["ring"]) == 1 + 3 * 2 * 3
        exp_lat, exp_lon = h3lite.cell_to_latlng(r["cell"])
        assert r["pt"]["lat"] == pytest.approx(exp_lat, abs=1e-12)
        assert r["pt"]["lon"] == pytest.approx(exp_lon, abs=1e-12)

    a = h3lite.latlng_to_cell(*POINTS[0], RES)
    pairs = spark.createDataFrame(
        [Row(a=a, b=c) for c in h3lite.grid_disk(a, 3)]
    )
    for r in pairs.select("a", "b", hex_grid_distance("a", "b").alias("d")).collect():
        assert r["d"] == h3lite.grid_distance(r["a"], r["b"])


def test_null_safety_through_hex_udfs(spark):
    df = spark.createDataFrame(
        [Row(lat=19.4, lon=-99.1), Row(lat=None, lon=-99.1)]
    )
    rows = df.select(hex_cell_of("lat", "lon", RES).alias("c")).collect()
    assert rows[0]["c"] is not None
    assert rows[1]["c"] is None
