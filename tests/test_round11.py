"""Round-11 surface tests: parquet_meta / graphml DataSources, the
TABLE-argument sessionize UDTF, and the streaming append/foreachBatch
queries' invariants the SQL oracles can't express."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# parquet_meta DataSource
# ---------------------------------------------------------------------------


def _meta(spark, path):
    from epiteam_network_etl_functions_spark.sources.parquet_meta_datasource import (
        register_parquet_meta,
    )

    register_parquet_meta(spark)
    return spark.read.format("parquet_meta").option("path", path).load()


def test_parquet_meta_matches_duckdb_bytes(spark):
    """Byte-level differential vs DuckDB's parquet_metadata() — the
    fields the oracle query can't check because content SQL can't see
    them (compressed/uncompressed sizes, row-group bytes)."""
    ours = {
        (r["file"], r["row_group"], r["path_in_schema"]): (
            r["num_values"],
            r["compressed_bytes"],
            r["uncompressed_bytes"],
            r["rg_total_bytes"],
        )
        for r in _meta(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    theirs = {}
    for row in con.execute(
        f"""SELECT file_name, row_group_id, path_in_schema, num_values,
                   total_compressed_size, total_uncompressed_size,
                   row_group_bytes
            FROM parquet_metadata('{SF_DIR}/*.parquet')"""
    ).fetchall():
        # DuckDB renders nested leaf paths as "a, list, element";
        # pyarrow (and this source) as "a.list.element"
        theirs[(os.path.basename(row[0]), row[1], row[2].replace(", ", "."))] = (
            row[3],
            row[4],
            row[5],
            row[6],
        )
    assert ours == theirs


def test_parquet_meta_partitions_per_file(spark):
    df = _meta(spark, SF_DIR)
    assert df.rdd.getNumPartitions() == 10  # one footer fetch per file


def test_parquet_meta_paths_option(spark):
    df = (
        spark.read.format("parquet_meta")
        .option(
            "paths",
            f"{SF_DIR}/orders.parquet,{SF_DIR}/region.parquet",
        )
        .load()
    )
    files = {r["file"] for r in df.select("file").distinct().collect()}
    assert files == {"orders.parquet", "region.parquet"}


# ---------------------------------------------------------------------------
# graphml reader
# ---------------------------------------------------------------------------


def test_graphml_roundtrip_exact(spark, tmp_path):
    """Writer -> reader round trip preserves the exact node and edge
    sets, including node attributes."""
    from epiteam_network_etl_functions_spark.operators.graphs import (
        write_graphml,
    )
    from epiteam_network_etl_functions_spark.sources.graphml_datasource import (
        register_graphml_source,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "a_node bigint, b_node bigint"
    )
    nodes = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (9, "iso")],
        "node_id bigint, label string",
    )
    path = str(tmp_path / "g.graphml")
    stats = write_graphml(
        path, edges, nodes=nodes, attr_cols=["label"]
    )
    assert stats == {"nodes": 4, "edges": 3}

    register_graphml_source(spark)
    g = spark.read.format("graphml").option("path", path).load()
    got_nodes = {
        r["node_id"]: r["attrs"]
        for r in g.where("element = 'node'").collect()
    }
    assert set(got_nodes) == {"1", "2", "3", "9"}
    assert json.loads(got_nodes["9"]) == {"label": "iso"}
    got_edges = {
        (r["src"], r["dst"]) for r in g.where("element = 'edge'").collect()
    }
    assert got_edges == {("1", "2"), ("2", "3"), ("1", "3")}


def test_graphml_reader_networkx_style_namespace(spark, tmp_path):
    """The reader parses documents regardless of attribute declaration
    order and tolerates self-closing node tags."""
    xml = """<?xml version='1.0' encoding='utf-8'?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="d0" for="node" attr.name="home" attr.type="string" />
  <graph edgedefault="undirected">
    <node id="a"><data key="d0">H1</data></node>
    <node id="b" />
    <edge source="a" target="b" />
  </graph>
</graphml>
"""
    path = str(tmp_path / "h.graphml")
    with open(path, "w") as f:
        f.write(xml)
    from epiteam_network_etl_functions_spark.sources.graphml_datasource import (
        register_graphml_source,
    )

    register_graphml_source(spark)
    g = spark.read.format("graphml").option("path", path).load()
    rows = {(r["element"], r["node_id"], r["src"], r["dst"]) for r in g.collect()}
    assert ("node", "a", None, None) in rows
    assert ("node", "b", None, None) in rows
    assert ("edge", None, "a", "b") in rows
    attrs = {
        r["node_id"]: r["attrs"] for r in g.where("element='node'").collect()
    }
    assert json.loads(attrs["a"]) == {"home": "H1"}
    assert attrs["b"] is None


# ---------------------------------------------------------------------------
# sessionize UDTF
# ---------------------------------------------------------------------------


def test_sessionize_udtf_matches_window_form(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.functions.udtf_sessionize import (
        register_sessionize_udtf,
    )

    register_sessionize_udtf(spark)
    e = catalog.load(spark, SF_DIR, "events").selectExpr(
        "user_id", "unix_micros(ts) AS ts"
    )
    e.createOrReplaceTempView("__t11_ev")
    udtf_out = spark.sql(
        """SELECT * FROM sessionize(
               TABLE(SELECT user_id, ts FROM __t11_ev)
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
            FROM __t11_ev),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
        SELECT user_id, min(ts) AS session_start_us,
               max(ts) AS session_end_us,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
        """
    )
    assert udtf_out.exceptAll(ref).count() == 0
    assert ref.exceptAll(udtf_out).count() == 0


def test_sessionize_udtf_gap_boundary(spark):
    """Gap exactly == threshold stays in-session; threshold + 1 us
    splits."""
    from epiteam_network_etl_functions_spark.functions.udtf_sessionize import (
        GAP_SECONDS,
        register_sessionize_udtf,
    )

    register_sessionize_udtf(spark)
    gap = GAP_SECONDS * 1_000_000
    rows = [(7, 0), (7, gap), (7, 2 * gap + 1)]
    spark.createDataFrame(
        rows, "user_id bigint, ts bigint"
    ).createOrReplaceTempView("__t11_edge")
    out = spark.sql(
        """SELECT * FROM sessionize(
               TABLE(SELECT user_id, ts FROM __t11_edge)
               PARTITION BY user_id ORDER BY ts)"""
    ).collect()
    assert [(r["n_events"]) for r in sorted(out, key=lambda r: r["session_start_us"])] == [2, 1]


# ---------------------------------------------------------------------------
# streaming invariants
# ---------------------------------------------------------------------------


def test_stream_append_never_emits_flush_window(spark):
    """The sentinel '__flush__' window must never appear in the sink
    (its window never closes)."""
    from epiteam_network_etl_functions_spark.workload import analytics16

    out = analytics16.stream_append_closed_windows(spark, SF_DIR)
    assert out.where(F.col("event_type") == "__flush__").count() == 0
    # and every real (hour, type) cell appears exactly once
    dup = (
        out.groupBy("window_start", "event_type")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0


def test_stream_foreach_batch_multiple_batches(spark):
    """The foreachBatch sink actually sees multiple micro-batches (the
    maxFilesPerTrigger split) and their union is exact."""
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.workload import analytics16

    out = analytics16.stream_foreach_batch_totals(spark, SF_DIR)
    expect = (
        catalog.load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
    )
    assert out.exceptAll(expect).count() == 0
    assert expect.exceptAll(out).count() == 0


# ---------------------------------------------------------------------------
# replay streaming source
# ---------------------------------------------------------------------------


def test_replay_source_batch_determinism(spark, tmp_path):
    """The replay source emits ceil(n / rows_per_batch) batches and the
    drained total equals the file's row count."""
    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        register_replay_source,
    )

    register_replay_source(spark)
    src = f"{SF_DIR}/events.parquet"
    stream = (
        spark.readStream.format("replay")
        .option("path", src)
        .option("rows_per_batch", "300")
        .load()
    )
    q = (
        stream.groupBy().count()
        .writeStream.format("memory")
        .queryName("t11_replay")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    last_batch = q.lastProgress["batchId"]
    q.stop()
    total = spark.table("t11_replay").collect()[0][0]
    import pyarrow.parquet as pq

    n = pq.ParquetFile(src).metadata.num_rows
    assert total == n
    assert last_batch + 1 >= (n + 299) // 300  # all row-batches ran


def test_replay_source_checkpoint_recovery(spark, tmp_path):
    """Restarting from the checkpoint resumes at the committed offset:
    the second run re-reads nothing and the final count is still exact
    (offset state, not the memory sink, carries the position)."""
    from pyspark.sql import functions as F  # noqa: F811
    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        register_replay_source,
    )

    register_replay_source(spark)
    src = f"{SF_DIR}/events.parquet"
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def start():
        stream = (
            spark.readStream.format("replay")
            .option("path", src)
            .option("rows_per_batch", "400")
            .load()
        )
        return (
            stream.select("event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out).count()
    q = start()  # resume: committed offset == total, nothing new
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(out)
    assert back.count() == n1
    import pyarrow.parquet as pq

    assert back.select("event_id").distinct().count() == pq.ParquetFile(
        src
    ).metadata.num_rows


# ---------------------------------------------------------------------------
# jsonl_py writer
# ---------------------------------------------------------------------------


def test_jsonl_writer_manifest_and_exactness(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    d = catalog.load(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    out = str(tmp_path / "docs")
    os.makedirs(out)
    d.repartition(4).write.format("jsonl_py").mode("append").save(out)

    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert len(man["shards"]) == 4
    assert man["total_rows"] == d.count()
    assert not os.path.exists(os.path.join(out, "_staging"))

    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        os.path.join(out, "*.jsonl")
    )
    assert back.count() == d.count()
    assert back.exceptAll(d).count() == 0
    assert d.exceptAll(back).count() == 0


def test_jsonl_writer_overwrite_replaces_shards(spark, tmp_path):
    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    out = str(tmp_path / "o")
    os.makedirs(out)
    a = spark.range(10).selectExpr("id AS doc_id")
    b = spark.range(3).selectExpr("id + 100 AS doc_id")
    a.coalesce(1).write.format("jsonl_py").mode("append").save(out)
    b.coalesce(1).write.format("jsonl_py").mode("overwrite").save(out)
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["total_rows"] == 3
    back = spark.read.schema("doc_id long").json(os.path.join(out, "*.jsonl"))
    assert sorted(r["doc_id"] for r in back.collect()) == [100, 101, 102]


def test_jsonl_stream_writer_per_batch_manifests(spark, tmp_path):
    """The streaming writer commits per micro-batch: one
    _MANIFEST-<batchId>.json per batch, manifested totals sum to the
    source row count, no staging leftovers."""
    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (
        register_jsonl_writer,
    )
    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        register_replay_source,
    )

    register_replay_source(spark)
    register_jsonl_writer(spark)
    src = f"{SF_DIR}/events.parquet"
    out = str(tmp_path / "out")
    os.makedirs(out)
    stream = (
        spark.readStream.format("replay")
        .option("path", src)
        .option("rows_per_batch", "400")
        .load()
        .select("event_id", "event_type")
    )
    q = (
        stream.writeStream.format("jsonl_py")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("_MANIFEST-")
    )
    import pyarrow.parquet as pq

    n = pq.ParquetFile(src).metadata.num_rows
    assert len(manifests) >= (n + 399) // 400
    total = 0
    for m in manifests:
        total += json.load(open(os.path.join(out, m)))["total_rows"]
    assert total == n
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = spark.read.schema("event_id long, event_type string").json(
        os.path.join(out, "*.jsonl")
    )
    assert back.count() == n
    assert back.select("event_id").distinct().count() == n


# ---------------------------------------------------------------------------
# mapInArrow kernel + analyze() UDTF
# ---------------------------------------------------------------------------


def test_arrow_norms_match_jvm_fold(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.operators.arrow_kernels import (
        l2_norms_arrow,
    )
    from epiteam_network_etl_functions_spark.operators.similarity import (
        as_double,
        l2_norm,
    )

    e = catalog.load(spark, SF_DIR, "embeddings")
    arrow = l2_norms_arrow(e)
    jvm = e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm(as_double(F.col("embedding"))), 6).alias("l2_norm"),
    )
    assert arrow.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(arrow).count() == 0


def test_jsoncols_udtf_dynamic_schema(spark):
    from epiteam_network_etl_functions_spark.functions.udtf_jsoncols import (
        register_jsoncols_udtf,
    )

    register_jsoncols_udtf(spark)
    out = spark.sql(
        """SELECT * FROM json_cols(
            '{"a": 1, "b": {"x": true}, "c": null}', 'a,b,missing')"""
    )
    assert out.columns == ["a", "b", "missing"]
    row = out.collect()[0]
    assert row["a"] == "1"
    assert json.loads(row["b"]) == {"x": True}
    assert row["missing"] is None


def test_jsoncols_udtf_malformed_json_yields_nulls(spark):
    from epiteam_network_etl_functions_spark.functions.udtf_jsoncols import (
        register_jsoncols_udtf,
    )

    register_jsoncols_udtf(spark)
    row = spark.sql(
        "SELECT * FROM json_cols('not json', 'k')"
    ).collect()[0]
    assert row["k"] is None


# ---------------------------------------------------------------------------
# drain_available_now (the ADVICE hardening)
# ---------------------------------------------------------------------------


def test_drain_raises_on_timeout_and_cleans_tmp(tmp_path):
    from epiteam_network_etl_functions_spark.utils import drain_available_now

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    (scratch / "x").write_text("1")

    class _StuckQuery:
        name = "stuck"

        def __init__(self):
            self.stopped = False

        def awaitTermination(self, timeout):
            return False  # timed out, sink only partially filled

        def stop(self):
            self.stopped = True

    q = _StuckQuery()
    with pytest.raises(RuntimeError, match="did not drain"):
        drain_available_now(q, str(scratch), timeout=1)
    assert q.stopped
    assert not scratch.exists()  # scratch reclaimed even on failure


def test_drain_success_removes_tmp(tmp_path):
    from epiteam_network_etl_functions_spark.utils import drain_available_now

    scratch = tmp_path / "s2"
    scratch.mkdir()

    class _DoneQuery:
        name = "done"

        def awaitTermination(self, timeout):
            return True

    drain_available_now(_DoneQuery(), str(scratch))
    assert not scratch.exists()


def test_dist_replay_executor_partitions(spark, tmp_path):
    """The partition-planned reader splits the offset range into
    row-span tasks and the drained union is exact."""
    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        register_replay_source,
    )

    register_replay_source(spark)
    src = f"{SF_DIR}/events.parquet"
    stream = (
        spark.readStream.format("replay_dist")
        .option("path", src)
        .option("rows_per_partition", "250")
        .load()
    )
    q = (
        stream.select("event_id")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import pyarrow.parquet as pq

    n = pq.ParquetFile(src).metadata.num_rows
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == n
    assert back.distinct().count() == n


def test_arrow_writer_preserves_list_column(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (
        register_parquet_py_writer,
    )

    register_parquet_py_writer(spark)
    e = catalog.load(spark, SF_DIR, "embeddings")
    out = str(tmp_path / "emb")
    os.makedirs(out)
    e.repartition(3).write.format("parquet_py").mode("append").save(out)
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["total_rows"] == e.count()
    back = spark.read.parquet(os.path.join(out, "*.parquet"))
    # exact row-level fidelity including the list<float> column
    assert back.exceptAll(e).count() == 0
    assert e.exceptAll(back).count() == 0


def test_parquet_meta_filter_pushdown_prunes_partitions(spark):
    """file = / IN predicates prune footer fetches at plan time (the
    Python DataSource pushFilters hook); unsupported predicates stay
    Spark-side and results are unchanged."""
    df = _meta(spark, SF_DIR)
    one = df.where("file = 'orders.parquet'")
    assert one.rdd.getNumPartitions() == 1
    assert one.select("file").distinct().collect()[0][0] == "orders.parquet"
    two = df.where("file IN ('orders.parquet', 'region.parquet')")
    assert two.rdd.getNumPartitions() == 2
    # an unpushable predicate keeps all partitions but stays correct
    doubles = df.where("physical_type = 'DOUBLE'")
    assert doubles.rdd.getNumPartitions() == 10
    assert doubles.count() == df.where(
        df.physical_type == "DOUBLE"
    ).count()


def test_parquet_py_stream_writer_manifests(spark, tmp_path):
    """Arrow streaming sink: per-batch manifests, exact union, staging
    drained."""
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (
        register_parquet_py_writer,
    )
    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        register_replay_source,
    )

    register_replay_source(spark)
    register_parquet_py_writer(spark)
    src = f"{SF_DIR}/events.parquet"
    out = str(tmp_path / "out")
    os.makedirs(out)
    stream = (
        spark.readStream.format("replay_dist")
        .option("path", src)
        .option("rows_per_partition", "400")
        .load()
        .select("event_id", "event_type")
    )
    q = (
        stream.writeStream.format("parquet_py")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import pyarrow.parquet as pq

    n = pq.ParquetFile(src).metadata.num_rows
    manifests = [f for f in os.listdir(out) if f.startswith("_MANIFEST-")]
    total = sum(
        json.load(open(os.path.join(out, m)))["total_rows"]
        for m in manifests
    )
    assert total == n
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = spark.read.parquet(os.path.join(out, "*.parquet"))
    assert back.count() == n
    assert back.select("event_id").distinct().count() == n


def test_applyinarrow_matches_jvm_checksums(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.workload.analytics16 import (
        applyinarrow_label_stats,
    )

    out = applyinarrow_label_stats(spark, SF_DIR)
    e = catalog.load(spark, SF_DIR, "embeddings")
    jvm = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("vec_id").cast("long").alias("sum_vec_id"),
        F.sum(
            F.aggregate(
                F.transform(
                    "embedding",
                    lambda x: F.round(x.cast("double") * 10000).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
        .cast("long")
        .alias("sum_q"),
    )
    assert out.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(out).count() == 0


def test_streaming_query_listener_observes_progress(spark, tmp_path):
    """StreamingQueryListener — the telemetry surface production
    monitoring hangs off: progress events carry exact per-batch row
    counts, so the listener's running total must equal the source row
    count after an availableNow drain."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Capture(StreamingQueryListener):
        def __init__(self):
            self.rows = 0
            self.batches = 0

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.rows += event.progress.numInputRows
            self.batches += 1

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    cap = _Capture()
    spark.streams.addListener(cap)
    try:
        from epiteam_network_etl_functions_spark.sources.replay_datasource import (
            register_replay_source,
        )

        register_replay_source(spark)
        src = f"{SF_DIR}/events.parquet"
        stream = (
            spark.readStream.format("replay_dist")
            .option("path", src)
            .option("rows_per_partition", "400")
            .load()
            .groupBy("event_type")
            .count()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("t_listener")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously; drain the bus
        import time

        import pyarrow.parquet as pq

        n = pq.ParquetFile(src).metadata.num_rows
        for _ in range(50):
            if cap.rows >= n:
                break
            time.sleep(0.2)
        assert cap.rows == n
        assert cap.batches >= 1
    finally:
        spark.streams.removeListener(cap)


def test_read_row_range_prunes_row_groups(tmp_path):
    """The replay readers' range read touches only the row groups
    intersecting the span (scale invariant: a batch never re-reads the
    whole file) and is exact across group boundaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from epiteam_network_etl_functions_spark.sources.replay_datasource import (
        _read_row_range,
    )

    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"i": list(range(1000))}), path, row_group_size=100
    )
    assert pq.ParquetFile(path).metadata.num_row_groups == 10
    for a, b in [(0, 50), (95, 105), (250, 750), (990, 1000), (300, 300)]:
        got = _read_row_range(path, a, b).column("i").to_pylist() if b > a else []
        if b > a:
            assert got == list(range(a, b))
    # empty span yields an empty table with the file's schema
    empty = _read_row_range(path, 300, 300)
    assert empty.num_rows == 0
    assert empty.schema.names == ["i"]


def test_process_all_available_watchdog(tmp_path):
    from epiteam_network_etl_functions_spark.utils import (
        process_all_available,
    )

    class _Hang:
        name = "hang"

        def __init__(self):
            self.stopped = False

        def processAllAvailable(self):
            import time

            time.sleep(30)

        def stop(self):
            self.stopped = True

    q = _Hang()
    with pytest.raises(RuntimeError, match="did not process"):
        process_all_available(q, timeout=1)
    assert q.stopped

    class _Errs:
        name = "errs"

        def processAllAvailable(self):
            raise ValueError("boom")

        def stop(self):
            pass

    with pytest.raises(ValueError, match="boom"):
        process_all_available(_Errs(), timeout=5)
