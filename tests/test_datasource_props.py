"""Property-based round trips for the round-11 Python DataSources.

Formats break on adversarial strings, not happy paths: embedded
newlines, quotes, angle brackets, unicode astral plane, XML-hostile
characters. Hypothesis drives the writer -> reader loops with exactly
those.
"""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# XML 1.0 forbids most C0 control chars entirely (they cannot be
# represented even escaped); JSON handles all of them. Keep the GraphML
# alphabet XML-legal, let JSONL take everything.
_xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        blacklist_characters="".join(
            chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)
        ),
    ),
    min_size=1,
    max_size=40,
)
_json_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(st.integers(0, 10_000), _json_text), min_size=1, max_size=25, unique_by=lambda r: r[0]))
def test_jsonl_writer_roundtrips_adversarial_text(spark, tmp_path_factory, rows):
    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    out = str(tmp_path_factory.mktemp("jsonl"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.format("jsonl_py").mode("overwrite").save(out)
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["total_rows"] == len(rows)
    back = spark.read.schema("doc_id long, text string").json(
        os.path.join(out, "*.jsonl")
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nodes=st.lists(
        st.tuples(st.integers(0, 50), _xml_text),
        min_size=2,
        max_size=10,
        unique_by=lambda r: r[0],
    )
)
def test_graphml_roundtrips_adversarial_attrs(spark, tmp_path_factory, nodes):
    """Node attributes with XML-hostile content (quotes, angle
    brackets, ampersands) survive writer escaping + reader parsing."""
    from epiteam_network_etl_functions_spark.operators.graphs import (
        write_graphml,
    )
    from epiteam_network_etl_functions_spark.sources.graphml_datasource import (
        register_graphml_source,
    )

    ids = [n[0] for n in nodes]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)],
        "a_node bigint, b_node bigint",
    )
    nodes_df = spark.createDataFrame(nodes, "node_id bigint, label string")
    path = str(tmp_path_factory.mktemp("gml") / "g.graphml")
    write_graphml(path, edges, nodes=nodes_df, attr_cols=["label"])
    register_graphml_source(spark)
    g = spark.read.format("graphml").option("path", path).load()
    got = {
        int(r["node_id"]): json.loads(r["attrs"])["label"]
        for r in g.where("element = 'node'").collect()
        if r["attrs"] is not None
    }
    assert got == dict(nodes)
    n_edges = g.where("element = 'edge'").count()
    assert n_edges == len(ids) - 1
