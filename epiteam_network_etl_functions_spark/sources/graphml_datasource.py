"""GraphML reader as a Spark 4 Python DataSource — the round-trip
counterpart of ``operators.graphs.write_graphml`` (S12).

The reference only ever WRITES GraphML (MakeEmpiricNetworks.py:108-126)
and re-reads it with networkx driver-side (seir_utils.py:64-70); a Spark
engine should be able to re-ingest those exports as a DataFrame without
networkx:

    spark.dataSource.register(GraphMLDataSource)
    spark.read.format("graphml").load("/path/g.graphml")

Unified long-format rows: ``element`` is ``node`` or ``edge``; nodes
carry ``node_id`` (+ ``attrs`` as a sorted-key JSON object of their
<data> values), edges carry ``src``/``dst``. One partition per file —
a GraphML document is a single XML tree (same driver-side-by-design
argument as the writer); sharded exports parallelize per file via the
``paths`` option.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

GRAPHML_SCHEMA = StructType(
    [
        StructField("element", StringType(), False),
        StructField("node_id", StringType(), True),
        StructField("src", StringType(), True),
        StructField("dst", StringType(), True),
        StructField("attrs", StringType(), True),  # JSON object
    ]
)

_NS = "{http://graphml.graphdrawing.org/xmlns}"


class _GraphMLPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GraphMLReader(DataSourceReader):
    def __init__(self, options):
        paths = options.get("paths")
        if paths:
            self.paths = [p for p in paths.split(",") if p]
        else:
            path = options.get("path")
            if not path:
                raise ValueError("graphml source requires path or paths")
            self.paths = sorted(glob.glob(path)) or [path]
        for p in self.paths:
            if not os.path.exists(p):
                raise FileNotFoundError(p)

    def partitions(self):
        return [_GraphMLPartition(p) for p in self.paths]

    def read(self, partition):
        import json
        import xml.etree.ElementTree as ET

        root = ET.parse(partition.path).getroot()
        # <key> declarations map key ids to attribute names
        key_names = {
            k.get("id"): k.get("attr.name")
            for k in root.findall(f"{_NS}key")
        }
        for graph in root.findall(f"{_NS}graph"):
            for node in graph.findall(f"{_NS}node"):
                attrs = {
                    key_names.get(d.get("key"), d.get("key")): d.text
                    for d in node.findall(f"{_NS}data")
                }
                yield (
                    "node",
                    node.get("id"),
                    None,
                    None,
                    json.dumps(attrs, sort_keys=True) if attrs else None,
                )
            for edge in graph.findall(f"{_NS}edge"):
                attrs = {
                    key_names.get(d.get("key"), d.get("key")): d.text
                    for d in edge.findall(f"{_NS}data")
                }
                yield (
                    "edge",
                    None,
                    edge.get("source"),
                    edge.get("target"),
                    json.dumps(attrs, sort_keys=True) if attrs else None,
                )


class GraphMLDataSource(DataSource):
    @classmethod
    def name(cls):
        return "graphml"

    def schema(self):
        return GRAPHML_SCHEMA

    def reader(self, schema):
        return GraphMLReader(self.options)


def register_graphml_source(spark) -> None:
    try:
        spark.dataSource.register(GraphMLDataSource)
    except Exception:
        pass
