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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), _json_text),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_parquet_py_roundtrips_adversarial_text(
    spark, tmp_path_factory, rows
):
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (
        register_parquet_py_writer,
    )

    register_parquet_py_writer(spark)
    out = str(tmp_path_factory.mktemp("pqpy"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.format("parquet_py").mode("overwrite").save(out)
    back = spark.read.parquet(os.path.join(out, "*.parquet"))
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts=st.lists(
        st.integers(0, 10_000_000_000),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_udtf_ties_match_window_form(spark, ts):
    """Random timestamp multisets — including heavy duplicates, where
    the UDTF's arrival order inside a tie is engine-chosen — produce
    the same session set as the SQL window form (a zero gap never
    splits, so tie order cannot matter; this locks that reasoning)."""
    from epiteam_network_etl_functions_spark.functions.udtf_sessionize import (
        register_sessionize_udtf,
    )

    register_sessionize_udtf(spark)
    rows = [(1, t) for t in ts]
    spark.createDataFrame(
        rows, "user_id bigint, ts bigint"
    ).createOrReplaceTempView("__prop_ev")
    udtf_out = spark.sql(
        """SELECT * FROM sessionize(
               TABLE(SELECT user_id, ts FROM __prop_ev)
               PARTITION BY user_id ORDER BY ts)"""
    )
    ref = spark.sql(
        """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            IS NULL
                        OR ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts) > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM __prop_ev),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
        SELECT user_id, min(ts) AS session_start_us,
               max(ts) AS session_end_us, count(*) AS n_events
        FROM s GROUP BY user_id, sid
        """
    )
    assert udtf_out.exceptAll(ref).count() == 0
    assert ref.exceptAll(udtf_out).count() == 0
