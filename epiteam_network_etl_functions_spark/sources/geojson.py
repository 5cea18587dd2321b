"""GeoJSON -> dimension-table seeding (reference S6/F5:
GeneratesMunicipioDB.ipynb cells 0-5 flatten an INEGI FeatureCollection
into a catalog with geometry kept as a GeoJSON *string* column —
SURVEY.md §1.1 'geospatial layer').

One-time, driver-side by design: catalogs are a few hundred rows. The
geometry stays an opaque string; spatial attribution goes through the
polygon->covering-cells dimension (plans/mobility.cells_to_regions_dim),
never a row-wise shapely loop.
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("cve_geo", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("geometry", T.StringType(), True),  # GeoJSON string
    ]
)


def feature_collection_to_catalog(
    spark: SparkSession,
    fc: Mapping,
    key_prop: str = "cve_geo",
    name_prop: str = "nom_agem",
) -> DataFrame:
    """Flatten a GeoJSON FeatureCollection into (cve_geo, name, geometry)
    rows; geometry serialized back to a JSON string exactly as the
    reference does (json.dumps(feat['geometry']))."""
    rows = []
    for feat in fc.get("features", []):
        props = feat.get("properties", {})
        rows.append(
            (
                str(props.get(key_prop)),
                props.get(name_prop),
                json.dumps(feat.get("geometry"), sort_keys=True),
            )
        )
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def polygon_bbox_cells(geometry_json: str, res: int) -> Sequence[str]:
    """Covering cells for a polygon via its bounding box on the fallback
    grid (the h3.polyfill stand-in used to build the cell->region dim).
    With h3 installed, swap for `h3.polygon_to_cells`."""
    import math

    from ..functions.hexgrid import _RES_DEG

    geom = json.loads(geometry_json)
    coords = geom.get("coordinates", [])
    pts = []

    def walk(c):
        if isinstance(c, (list, tuple)) and c and isinstance(c[0], (int, float)):
            pts.append((float(c[1]), float(c[0])))  # GeoJSON is lon,lat
        else:
            for x in c:
                walk(x)

    walk(coords)
    if not pts:
        return []
    size = _RES_DEG[res]
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    cells = set()
    i0, i1 = math.floor(min(lats) / size), math.floor(max(lats) / size)
    j0, j1 = math.floor(min(lons) / size), math.floor(max(lons) / size)
    for i in range(i0, i1 + 1):
        for j in range(j0, j1 + 1):
            cells.add(f"g{res}:{i}:{j}")
    return sorted(cells)
