"""Custom Python data source (Spark 4 DataSource API) for GeoJSON catalogs.

Makes the S6 dimension-seeding path a first-class reader:

    spark.dataSource.register(GeoJSONDataSource)
    spark.read.format("geojson").load("/path/to/municipios.geojson")

One partition per FeatureCollection file — catalogs are small dimensions;
the value of the DataSource form is schema declaration + pushdown-free
uniformity with the rest of the read API (and it exercises Spark's Python
data-source machinery, which a custom binary-corpus reader would use the
same way at scale).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StringType, StructField, StructType

GEOJSON_SCHEMA = StructType(
    [
        StructField("feature_id", StringType(), True),
        StructField("properties", StringType(), True),  # JSON string
        StructField("geometry", StringType(), True),  # GeoJSON string
        StructField("geom_type", StringType(), True),
    ]
)


class GeoJSONReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("geojson source requires a path")

    def read(self, partition):
        with open(self.path) as f:
            fc = json.load(f)
        for i, feat in enumerate(fc.get("features", [])):
            props = feat.get("properties", {}) or {}
            geom = feat.get("geometry")
            yield (
                str(feat.get("id", i)),
                json.dumps(props, sort_keys=True),
                json.dumps(geom, sort_keys=True) if geom is not None else None,
                (geom or {}).get("type"),
            )


class GeoJSONDataSource(DataSource):
    @classmethod
    def name(cls):
        return "geojson"

    def schema(self):
        return GEOJSON_SCHEMA

    def reader(self, schema):
        return GeoJSONReader(self.options)
