"""Round-14 regression tests for the ADVICE r13 fixes.

1. ``parquet_py`` batch sink, append semantics: a second append must
   MERGE the prior manifest's shards (not clobber the manifest with
   only the new commit's shards), and an all-empty append onto a
   directory that already holds shards must neither write the
   synthetic ``part-empty.parquet`` nor rewrite the manifest to
   ``total_rows=0``.
2. ``ProgressAuditListener.wait_terminated`` must count terminations
   only from WATCHED queries — a concurrent unrelated query's
   termination must not satisfy the wait (that race is the reason the
   method exists).

Plus the round-14 idea-bank surface (PLANS.md round-14 queue #4): the
listener-driven BACKPRESSURE audit — ``summary()['max_batch_input_rows']``
proves a source admission bound (maxFilesPerTrigger) actually bounds
per-trigger intake, the invariant a 100 TB streaming deployment alerts
on (totals can look healthy while one giant batch blows executor
memory or the state store).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _register(spark):
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (  # noqa: E501
        register_parquet_py_writer,
    )

    register_parquet_py_writer(spark)


# ---------------------------------------------------------------------------
# parquet_py append: manifest is the union of all committed shards
# ---------------------------------------------------------------------------


def test_parquet_py_append_merges_manifest(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "merge")
    os.makedirs(out)

    df1 = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    df1.write.format("parquet_py").mode("append").save(out)
    df2 = spark.range(100, 150).select(F.col("id").alias("doc_id"))
    df2.write.format("parquet_py").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 150
    # every manifest shard exists on disk, and every parquet on disk is
    # in the manifest — nothing dropped, nothing orphaned
    on_disk = {f for f in os.listdir(out) if f.endswith(".parquet")}
    assert {s["shard"] for s in manifest["shards"]} == on_disk
    assert spark.read.parquet(out).count() == 150


def test_parquet_py_empty_append_preserves_prior_shards(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "empty_append")
    os.makedirs(out)

    df = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    df.write.format("parquet_py").mode("append").save(out)

    empty = df.where(F.lit(False))
    empty.write.format("parquet_py").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    # prior shards survive; no synthetic empty shard; totals intact
    assert manifest["total_rows"] == 97
    assert all(s["shard"] != "part-empty.parquet" for s in manifest["shards"])
    assert not os.path.exists(os.path.join(out, "part-empty.parquet"))
    assert spark.read.parquet(out).count() == 97


def test_jsonl_py_append_merges_manifest(spark, tmp_path):
    """Same defect class as parquet_py (found by auditing the sibling
    sink): a second append must merge the prior manifest, not clobber
    it with only the new commit's shards."""
    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (  # noqa: E501
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    out = str(tmp_path / "jsonl_merge")
    os.makedirs(out)

    spark.range(0, 80).select(F.col("id").alias("doc_id")).write.format(
        "jsonl_py"
    ).mode("append").save(out)
    spark.range(80, 110).select(F.col("id").alias("doc_id")).write.format(
        "jsonl_py"
    ).mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 110
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert {s["shard"] for s in manifest["shards"]} == on_disk
    assert spark.read.json(out).count() == 110


def test_parquet_py_overwrite_resets_manifest(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "ovw")
    os.makedirs(out)

    spark.range(0, 100).select(F.col("id").alias("doc_id")).write.format(
        "parquet_py"
    ).mode("append").save(out)
    spark.range(0, 7).select(F.col("id").alias("doc_id")).write.format(
        "parquet_py"
    ).mode("overwrite").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 7
    assert spark.read.parquet(out).count() == 7


# ---------------------------------------------------------------------------
# two-phase commit abort path: a failed write publishes NOTHING — no
# shards in the target dir, no manifest, staging cleaned
# ---------------------------------------------------------------------------


def test_writer_abort_publishes_nothing(spark, tmp_path):
    import pyspark.sql.types as T

    from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (  # noqa: E501
        register_jsonl_writer,
    )
    from epiteam_network_etl_functions_spark.sources.parquet_py_writer_datasource import (  # noqa: E501
        register_parquet_py_writer,
    )

    register_jsonl_writer(spark)
    register_parquet_py_writer(spark)

    @F.udf(T.LongType())
    def boom(v):
        if v == 450:  # fails in a late partition, after others staged
            raise ValueError("synthetic task failure")
        return v

    failing = spark.range(0, 500).select(boom(F.col("id")).alias("doc_id"))
    for fmt, ext in (("jsonl_py", ".jsonl"), ("parquet_py", ".parquet")):
        out = str(tmp_path / f"abort_{fmt}")
        os.makedirs(out)
        try:
            failing.write.format(fmt).mode("append").save(out)
            raise AssertionError("write should have failed")
        except Exception as e:  # noqa: BLE001 - Py4J wraps the task error
            assert "synthetic task failure" in str(e)
        # the two-phase-commit promise: nothing PUBLISHED — no data
        # shards in the target dir, no manifest. (A zombie task still
        # in flight when abort() fires may recreate _staging with an
        # orphan — the protocol tolerates that by design: staged files
        # are invisible to readers and swept by the next commit.)
        left = set(os.listdir(out))
        assert not any(f.endswith(ext) for f in left), left
        assert "_MANIFEST.json" not in left
        # a subsequent successful write publishes exactly its own rows
        # (orphans in staging never leak into the manifest)
        spark.range(0, 7).select(F.col("id").alias("doc_id")).write.format(
            fmt
        ).mode("append").save(out)
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["total_rows"] == 7
        reader = spark.read.json if fmt == "jsonl_py" else spark.read.parquet
        assert reader(out).count() == 7


# ---------------------------------------------------------------------------
# listener: unrelated terminations don't satisfy wait_terminated
# ---------------------------------------------------------------------------


def test_listener_ignores_unrelated_terminations(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.listener import (
        ProgressAuditListener,
    )

    src_dir = str(tmp_path / "events_src")
    catalog.load(spark, SF_DIR, "events").limit(200).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    listener = ProgressAuditListener({"r14_watched"})
    spark.streams.addListener(listener)
    try:
        # 1) run-to-completion of an UNRELATED query
        q_other = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .select("event_id")
            .writeStream.format("memory")
            .queryName("r14_unrelated")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q_other.awaitTermination(120)
        # its termination must NOT satisfy the watched wait
        assert not listener.wait_terminated(1, timeout_s=5.0)
        assert listener.summary("r14_watched")["n_batches"] == 0

        # 2) the watched query terminates -> the wait is satisfied
        q_watched = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .select("event_id")
            .writeStream.format("memory")
            .queryName("r14_watched")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q_watched.awaitTermination(120)
        assert listener.wait_terminated(1, timeout_s=60.0)
        s = listener.summary("r14_watched")
        assert s["num_input_rows"] == 200
    finally:
        spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# backpressure audit: maxFilesPerTrigger bounds per-batch intake, and the
# listener's max_batch_input_rows is the proof
# ---------------------------------------------------------------------------


def test_listener_observes_watermark_state_eviction(spark, tmp_path):
    """The 100 TB state-store health invariant, observed through the
    listener: with time-ordered input batches and a 0-second watermark,
    closed windows must be EVICTED between batches — state is bounded
    by the open-window set, not by the stream's total group count.
    Asserts eviction actually happened (numRowsRemoved > 0 somewhere)
    and that peak state stayed below the no-eviction ceiling."""
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.listener import (
        ProgressAuditListener,
    )

    # 4 files covering disjoint, increasing time ranges — each batch
    # advances the watermark past the previous batch's windows
    src_dir = str(tmp_path / "evict_src")
    (
        catalog.load(spark, SF_DIR, "events")
        .limit(2000)
        .repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(src_dir)
    )
    schema = spark.read.parquet(src_dir).schema
    n_windows = (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "600 seconds"))
        .count()
        .count()
    )

    listener = ProgressAuditListener({"r14_evict"})
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "600 seconds"))
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("r14_evict")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert listener.wait_terminated(1, timeout_s=60)

        s = listener.summary("r14_evict")
        assert s["n_batches"] >= 4
        removed = sum(
            int(op.get("numRowsRemoved", 0))
            for p in listener.progresses
            if p.get("name") == "r14_evict"
            for op in p.get("stateOperators", [])
        )
        # eviction observed, and peak state strictly below the ceiling
        # an unbounded (no-watermark) run would reach
        assert removed > 0
        assert 0 < s["max_state_rows"] < n_windows
        # append mode emits ONLY closed windows: the last batch's
        # windows are still open at termination (its own data never
        # advances the watermark past itself), so the sink holds a
        # strict, non-empty subset of the window set
        sink_rows = spark.sql(
            "SELECT count(*) AS n FROM r14_evict"
        ).first()["n"]
        assert 0 < sink_rows < n_windows
    finally:
        spark.streams.removeListener(listener)


def test_listener_backpressure_audit_max_files_per_trigger(spark, tmp_path):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.streaming.listener import (
        ProgressAuditListener,
    )

    # 4 parquet files of 100 rows each — the admission unit is the file
    src_dir = str(tmp_path / "bp_src")
    (
        catalog.load(spark, SF_DIR, "events")
        .limit(400)
        .repartition(4)
        .write.parquet(src_dir)
    )
    schema = spark.read.parquet(src_dir).schema
    n_files = len(
        [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    )
    assert n_files == 4
    per_file_max = max(
        r["n"]
        for r in spark.read.parquet(src_dir)
        .groupBy(F.input_file_name())
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    def drain(qname: str, max_files: int | None):
        listener = ProgressAuditListener({qname})
        spark.streams.addListener(listener)
        try:
            reader = spark.readStream.schema(schema)
            if max_files is not None:
                reader = reader.option("maxFilesPerTrigger", str(max_files))
            q = (
                reader.parquet(src_dir)
                .select("event_id")
                .writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert listener.wait_terminated(1, timeout_s=60)
            return listener.summary(qname)
        finally:
            spark.streams.removeListener(listener)

    bounded = drain("r14_bp_bounded", 1)
    unbounded = drain("r14_bp_unbounded", None)

    # both drained everything
    assert bounded["num_input_rows"] == 400
    assert unbounded["num_input_rows"] == 400
    # the bound held EVERY batch: one file's rows max per trigger
    assert bounded["n_batches"] >= n_files
    assert bounded["max_batch_input_rows"] <= per_file_max
    # without the bound, availableNow admits the whole backlog at once
    assert unbounded["max_batch_input_rows"] == 400
    assert unbounded["max_batch_input_rows"] > bounded["max_batch_input_rows"]
