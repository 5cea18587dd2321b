"""Property-based locks for h3lite (hypothesis): lattice invariants that
must hold for EVERY point/cell, not just the fixed vectors in
test_h3lite.py."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from epiteam_network_etl_functions_spark.functions import h3lite

RES = 9

# Keep points in the sane geographic band; the lattice is planar over
# degrees, so poles/antimeridian are out of scope by design (real h3
# handles those; h3lite documents the difference).
lat_s = st.floats(min_value=-60.0, max_value=60.0, allow_nan=False, width=64)
lon_s = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=64)
k_s = st.integers(min_value=0, max_value=4)


@given(lat=lat_s, lon=lon_s)
@settings(max_examples=200, deadline=None)
def test_centroid_round_trip(lat, lon):
    cell = h3lite.latlng_to_cell(lat, lon, RES)
    clat, clon = h3lite.cell_to_latlng(cell)
    assert h3lite.latlng_to_cell(clat, clon, RES) == cell


@given(lat=lat_s, lon=lon_s, k=k_s)
@settings(max_examples=100, deadline=None)
def test_disk_size_and_membership(lat, lon, k):
    c = h3lite.latlng_to_cell(lat, lon, RES)
    disk = h3lite.grid_disk(c, k)
    assert len(disk) == 1 + 3 * k * (k + 1)
    assert len(set(disk)) == len(disk)
    assert all(h3lite.grid_distance(c, d) <= k for d in disk)


@given(lat=lat_s, lon=lon_s, lat2=lat_s, lon2=lon_s)
@settings(max_examples=100, deadline=None)
def test_greedy_descent_realizes_distance(lat, lon, lat2, lon2):
    """distance is a true shortest-path metric: from any cell there is a
    neighbor strictly closer to the target, so greedy descent reaches the
    target in exactly distance(a, b) steps."""
    a = h3lite.latlng_to_cell(lat, lon, RES)
    b = h3lite.latlng_to_cell(lat2, lon2, RES)
    d = h3lite.grid_distance(a, b)
    cur, steps = a, 0
    while cur != b:
        nbrs = [n for n in h3lite.grid_disk(cur, 1) if n != cur]
        cur = min(nbrs, key=lambda n: h3lite.grid_distance(n, b))
        steps += 1
        assert steps <= d  # every step reduces distance by exactly 1
    assert steps == d


@given(points=st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=30))
@settings(max_examples=25, deadline=None)
def test_sql_differential_random_points(points):
    # Inject via string->double casts: a bare numeric literal in VALUES is
    # parsed as DECIMAL(17,15), and DuckDB's DECIMAL->DOUBLE conversion can
    # land up to 2 ulp away from python's float() of the same string —
    # the engines would receive DIFFERENT inputs, which is a harness bug,
    # not an arithmetic divergence (found by hypothesis at
    # lat=25.979074252547278: a cube-rounding tie flipped). String->double
    # is IEEE-nearest in both engines, and the real gates feed parquet
    # doubles, where no parse is involved at all.
    con = duckdb.connect()
    expr = h3lite.axial_sql_exprs("lat", "lon", RES)
    vals = ", ".join(
        f"(CAST('{lat!r}' AS DOUBLE), CAST('{lon!r}' AS DOUBLE))"
        for lat, lon in points
    )
    rows = con.execute(
        f"SELECT {expr} FROM (VALUES {vals}) AS t(lat, lon)"
    ).fetchall()
    for (lat, lon), (got,) in zip(points, rows):
        assert got == h3lite.latlng_to_cell(lat, lon, RES), (lat, lon)
