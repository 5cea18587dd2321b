#!/usr/bin/env python
"""Runnable tour of the engine's custom Python DataSource quartet
(Spark 4 DataSource API — all four quadrants of batch/stream x
read/write):

1. BATCH READ   — `parquet_meta`: the catalog's parquet footers as a
   table (zone-map audit without scanning a byte of data);
2. BATCH WRITE  — `jsonl_py`: two-phase task-commit JSONL sink
   (staging -> rename + manifest);
3. STREAM READ  — `replay`: deterministic micro-batch replay of a
   parquet table with row-position offsets;
4. STREAM WRITE — `jsonl_py` streamWriter: per-batch commits, one
   manifest per batchId;
5. and the EXECUTOR-SCALE stream read — `replay_dist`, the
   partition-planned DataSourceStreamReader whose row-span tasks read
   Arrow RecordBatches on executors (4-5.6x the simple reader at the
   1M-row tier).

    python examples/datasource_demo.py [sf_dir] [out_dir]

Runs in well under a minute on the sf0.001 testdata.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.session import get_session
from epiteam_network_etl_functions_spark.sources.jsonl_writer_datasource import (
    register_jsonl_writer,
)
from epiteam_network_etl_functions_spark.sources.parquet_meta_datasource import (
    register_parquet_meta,
)
from epiteam_network_etl_functions_spark.sources.replay_datasource import (
    register_replay_source,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="datasource_demo_")
    )
    spark = get_session("datasource-demo")
    register_parquet_meta(spark)
    register_jsonl_writer(spark)
    register_replay_source(spark)

    print("== 1. batch read: footer metadata, no data scan ==")
    meta = spark.read.format("parquet_meta").option("path", sf_dir).load()
    meta.groupBy("file").agg(
        F.sum(F.when(F.col("column_id") == 0, F.col("rg_num_rows")))
        .cast("long")
        .alias("rows"),
        F.sum("compressed_bytes").alias("compressed"),
        F.sum("uncompressed_bytes").alias("uncompressed"),
    ).orderBy("file").show(truncate=False)

    print("== 2. batch write: two-phase commit JSONL sink ==")
    docs_out = os.path.join(out_dir, "docs")
    os.makedirs(docs_out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    docs.repartition(4).write.format("jsonl_py").mode("overwrite").save(docs_out)
    manifest = json.load(open(os.path.join(docs_out, "_MANIFEST.json")))
    print(
        f"committed {len(manifest['shards'])} shards,"
        f" {manifest['total_rows']} rows"
    )

    print("== 3+4. stream read -> stream write: the full Python pipe ==")
    events_out = os.path.join(out_dir, "events")
    os.makedirs(events_out, exist_ok=True)
    stream = (
        spark.readStream.format("replay")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("rows_per_batch", "300")
        .load()
        .select("event_id", "event_type")
    )
    q = (
        stream.writeStream.format("jsonl_py")
        .option("path", events_out)
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    manifests = sorted(
        f for f in os.listdir(events_out) if f.startswith("_MANIFEST-")
    )
    total = sum(
        json.load(open(os.path.join(events_out, m)))["total_rows"]
        for m in manifests
    )
    back = spark.read.schema("event_id long, event_type string").json(
        os.path.join(events_out, "*.jsonl")
    )
    print(
        f"{len(manifests)} micro-batch manifests, {total} manifested rows,"
        f" {back.count()} rows re-read"
    )
    print("== 5. executor-scale stream read: partition-planned replay ==")
    dist = (
        spark.readStream.format("replay_dist")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("rows_per_partition", "250")
        .load()
        .groupBy("event_type")
        .count()
    )
    q2 = (
        dist.writeStream.format("memory")
        .queryName("demo_dist")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    spark.table("demo_dist").orderBy("event_type").show()

    print(f"demo artifacts in {out_dir}")


if __name__ == "__main__":
    main()
