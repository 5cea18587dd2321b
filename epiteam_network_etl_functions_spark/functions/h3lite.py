"""h3lite: a pure-python hexagonal grid with the H3 API surface.

The real `h3` package is not installable in this container, so the hexgrid
UDFs' ``_h3.latlng_to_cell / grid_disk / grid_distance / cell_to_latlng``
call sites were dead code guarded by ``HAVE_H3`` — a typo there would have
passed every gate. This module is the API-compatible stand-in hexgrid
falls back to, so those exact call sites execute in every test run.

What it is: a TRUE hexagon lattice — pointy-top axial coordinates over the
(lon, lat) degree plane, cube rounding for point->cell, hexagonal k-rings
(|disk(k)| = 1 + 3k(k+1), not the square fallback's Chebyshev (2k+1)²) and
the hex distance metric (|dq| + |dr| + |dq+dr|) / 2. This is the semantic
shape of the reference's h3 usage (ntl_transforms.py:64-65 geo_to_h3,
home_ageb_imputers.py:36-39 k_ring widening, RadiusOfGyrationHandler.py:
139-140 h3_distance) — hex ring ≠ Chebyshev ring is exactly what the
square fallback cannot express.

What it is NOT: H3's icosahedral indexing. Real H3 cell ids derive from
20-face gnomonic projection tables (faceCenterGeo / baseCellData in
uber/h3); reproducing those constants without the library to validate
against would be unverifiable self-certification, so ids here are plain
lattice ids ``x{res}:{q}:{r}`` that can never be mistaken for H3 ids.
When the real `h3` package is present, hexgrid uses it instead and
tests/test_hexgrid_h3.py locks true H3 parity.

Every operation is exact integer/IEEE754 arithmetic expressible verbatim
in SQL — `axial_sql_exprs` emits the identical text for Spark SQL and
DuckDB, and tests/test_h3lite.py runs the python-vs-SQL differential.
"""

from __future__ import annotations

import math

# Cell size (circumradius in degrees) per resolution: the same exact
# binary fractions the square fallback uses for its width, so hex and
# square tiers are comparable.
_RES_SIZE = {r: 10.0 / (2**r) for r in range(16)}

_SQRT3 = math.sqrt(3.0)


def _axial_of(lat: float, lon: float, res: int) -> tuple[int, int]:
    s = _RES_SIZE[res]
    qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / s
    rf = (2.0 / 3.0 * lat) / s
    yf = -qf - rf
    # round-half-up via floor(x + 0.5): python's round() is banker's
    # rounding, which SQL cannot mirror — keep both engines on floor.
    rx = math.floor(qf + 0.5)
    ry = math.floor(yf + 0.5)
    rz = math.floor(rf + 0.5)
    dx = abs(rx - qf)
    dy = abs(ry - yf)
    dz = abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def latlng_to_cell(lat: float, lng: float, res: int) -> str:
    """(lat, lng) -> hex cell id (h3.latlng_to_cell API shape)."""
    q, r = _axial_of(lat, lng, res)
    return f"x{res}:{q}:{r}"


def _parse(cell: str) -> tuple[int, int, int]:
    head, q, r = cell.split(":")
    if not head.startswith("x"):
        raise ValueError(f"not an h3lite cell id: {cell!r}")
    return int(head[1:]), int(q), int(r)


def cell_to_latlng(cell: str) -> tuple[float, float]:
    """Cell centroid (h3.cell_to_latlng API shape: returns (lat, lng))."""
    res, q, r = _parse(cell)
    s = _RES_SIZE[res]
    lon = s * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    lat = s * (1.5 * r)
    return (lat, lon)


def grid_distance(a: str, b: str) -> int:
    """Hex distance in grid hops: (|dq| + |dr| + |dq+dr|) / 2."""
    ra, qa, sa = _parse(a)
    rb, qb, sb = _parse(b)
    if ra != rb:
        raise ValueError(f"cells at different resolutions: {a!r} vs {b!r}")
    dq = qa - qb
    dr = sa - sb
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


def grid_disk(cell: str, k: int) -> list[str]:
    """All cells within k hops, origin included — 1 + 3k(k+1) cells
    (h3.grid_disk API shape). Shares :func:`disk_offsets` so the Python
    disk and the SQL-side ring expansion can never desynchronize."""
    res, q, r = _parse(cell)
    return [f"x{res}:{q + dq}:{r + dr}" for dq, dr in disk_offsets(k)]


def disk_offsets(k: int) -> list[tuple[int, int]]:
    """The (dq, dr) offsets of grid_disk, for SQL-side ring expansion."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]


def axial_sql_steps(lat: str, lon: str, res: int, out: str = "cell") -> list[tuple[str, str]]:
    """The :func:`axial_sql_exprs` computation as an ordered list of
    (column_name, sql_expr) steps, each referencing earlier names. Same
    IEEE754 ops in the same order — but staged into small projections, so
    Spark's whole-stage codegen keeps the pipeline compiled where the
    single self-expanding expression (every term re-inlines qf/rf) blows
    the janino method limit and drops the stage to interpreted mode.
    Apply on Spark with sequential selectExpr("*", f"{expr} AS {name}")
    and on DuckDB with the same exprs in nested SELECTs."""
    s = f"cast({_RES_SIZE[res]!r} as double)"
    return [
        ("__qf", f"((sqrt(cast(3.0 as double)) / cast(3.0 as double) * {lon}"
                 f" - {lat} / cast(3.0 as double)) / {s})"),
        ("__rf", f"((cast(2.0 as double) / cast(3.0 as double) * {lat}) / {s})"),
        ("__yf", "(- __qf - __rf)"),
        ("__rx", "cast(floor(__qf + cast(0.5 as double)) as double)"),
        ("__ry", "cast(floor(__yf + cast(0.5 as double)) as double)"),
        ("__rz", "cast(floor(__rf + cast(0.5 as double)) as double)"),
        ("__dx", "abs(__rx - __qf)"),
        ("__dy", "abs(__ry - __yf)"),
        ("__dz", "abs(__rz - __rf)"),
        ("__hq", "(CASE WHEN __dx > __dy AND __dx > __dz"
                 " THEN - __ry - __rz ELSE __rx END)"),
        ("__hr", "(CASE WHEN NOT (__dx > __dy AND __dx > __dz) AND NOT (__dy > __dz)"
                 " THEN - __rx - __ry ELSE __rz END)"),
        (out, f"concat('x{res}:', cast(cast(__hq as bigint) as string), ':', "
              f"cast(cast(__hr as bigint) as string))"),
    ]


def axial_sql_exprs(lat: str, lon: str, res: int) -> str:
    """The :func:`axial_sql_steps` computation folded into ONE SQL
    expression (each step name textually substituted by its definition) —
    for contexts that can't stage intermediate columns. Derived from the
    steps list, so the two SQL forms share a single source of truth and
    cannot drift. Prefer the staged form in hot paths: the inline
    expression re-expands qf/rf per term, which blows whole-stage
    codegen's method limit (see axial_sql_steps)."""
    env: dict[str, str] = {}
    for name, expr in axial_sql_steps(lat, lon, res):
        for prior, definition in env.items():
            expr = expr.replace(prior, definition)
        env[name] = f"({expr})"
    return env["cell"]
