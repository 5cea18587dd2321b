"""GraphML sink (S12): direct XML emission, no networkx required.

Mirrors the reference's export shape (MakeEmpiricNetworks.py:108-126):
undirected graph from the co-location edge list + isolated nodes, with
caid/home_ageb node attributes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.operators.graphs import write_graphml

NS = {"g": "http://graphml.graphdrawing.org/xmlns"}


def _load(path):
    root = ET.parse(path).getroot()
    graph = root.find("g:graph", NS)
    nodes = graph.findall("g:node", NS)
    edges = graph.findall("g:edge", NS)
    keys = {k.get("id"): k for k in root.findall("g:key", NS)}
    return root, graph, nodes, edges, keys


def test_write_graphml_attributes_and_isolated_nodes(spark, tmp_path):
    edges = spark.createDataFrame(
        [Row(a_caid="a", b_caid="b"), Row(a_caid="b", b_caid="c")]
    )
    # "iso" is the reference's not_connected node; "zed" appears only as an
    # edge endpoint in a second write below.
    nodes = spark.createDataFrame(
        [Row(caid="a", home_ageb="0901200010010", degree=2),
         Row(caid="b", home_ageb="1501200010020", degree=2),
         Row(caid="c", home_ageb=None, degree=1),
         Row(caid="iso", home_ageb="0901200010099", degree=0)]
    )
    path = str(tmp_path / "empiric.graphml")
    counts = write_graphml(
        path, edges, a_col="a_caid", b_col="b_caid",
        nodes=nodes, id_col="caid", attr_cols=["home_ageb", "degree"],
    )
    assert counts == {"nodes": 4, "edges": 2}

    root, graph, xnodes, xedges, keys = _load(path)
    assert graph.get("edgedefault") == "undirected"
    assert {n.get("id") for n in xnodes} == {"a", "b", "c", "iso"}
    assert [(e.get("source"), e.get("target")) for e in xedges] == [
        ("a", "b"), ("b", "c")
    ]
    # key declarations carry the Spark schema types
    by_name = {k.get("attr.name"): k.get("attr.type") for k in keys.values()}
    assert by_name == {"home_ageb": "string", "degree": "long"}
    # attribute values round-trip; NULL attr is omitted, not written as "None"
    a_node = next(n for n in xnodes if n.get("id") == "a")
    data = {d.get("key"): d.text for d in a_node.findall("g:data", NS)}
    key_of = {k.get("attr.name"): kid for kid, k in keys.items()}
    assert data[key_of["home_ageb"]] == "0901200010010"
    assert data[key_of["degree"]] == "2"
    c_node = next(n for n in xnodes if n.get("id") == "c")
    c_keys = {d.get("key") for d in c_node.findall("g:data", NS)}
    assert key_of["home_ageb"] not in c_keys


def test_write_graphml_declares_endpoint_only_nodes(spark, tmp_path):
    edges = spark.createDataFrame([Row(a_caid="x", b_caid="zed")])
    path = str(tmp_path / "bare.graphml")
    counts = write_graphml(path, edges, a_col="a_caid", b_col="b_caid")
    assert counts == {"nodes": 2, "edges": 1}
    _, _, xnodes, xedges, _ = _load(path)
    # every edge endpoint is declared as a node before the edge list
    assert {n.get("id") for n in xnodes} == {"x", "zed"}
    assert len(xedges) == 1


def test_write_graphml_escapes_xml_specials(spark, tmp_path):
    edges = spark.createDataFrame([Row(a_caid='d<&>"1', b_caid="d2")])
    nodes = spark.createDataFrame([Row(caid='d<&>"1', label="<tag>&amp;")])
    path = str(tmp_path / "escaped.graphml")
    write_graphml(path, edges, a_col="a_caid", b_col="b_caid",
                  nodes=nodes, id_col="caid", attr_cols=["label"])
    _, _, xnodes, xedges, _ = _load(path)  # parse would fail if unescaped
    assert 'd<&>"1' in {n.get("id") for n in xnodes}
    assert xedges[0].get("source") == 'd<&>"1'
