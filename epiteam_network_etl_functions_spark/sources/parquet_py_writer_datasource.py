"""Parquet-shard sink via the ARROW-optimized Python DataSource writer
(Spark 4 ``DataSourceArrowWriter``).

The jsonl_py sink certifies the row-iterator writer protocol; this one
certifies the Arrow fast path — tasks receive ``pyarrow.RecordBatch``
objects straight off the executor's columnar data (no Row materialization,
the list<float> embedding column stays a flat values buffer) and write a
parquet shard with pyarrow. Same two-phase commit as jsonl_py: staging ->
rename + ``_MANIFEST.json`` on driver commit.

    spark.dataSource.register(ParquetPyWriterDataSource)
    df.write.format("parquet_py").mode("append").save("/out/dir")

``arrow_writer_roundtrip`` locks the full fidelity of the round trip
(including the nested list column) against integer checksums both
engines compute.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class ParquetPyCommit(WriterCommitMessage):
    def __init__(self, shard: str, n_rows: int):
        self.shard = shard
        self.n_rows = n_rows


class ParquetPyWriter(DataSourceArrowWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("parquet_py sink requires a path")
        self.overwrite = overwrite
        self.schema = schema
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        batches = list(iterator)
        table = (
            pa.Table.from_batches(batches)
            if batches
            else None
        )
        n = 0
        if table is not None:
            pq.write_table(table, os.path.join(self.staging, name))
            n = table.num_rows
        else:
            # empty partition stages nothing and returns an empty shard
            # name, which commit() skips
            return ParquetPyCommit("", 0)
        return ParquetPyCommit(name, n)

    def commit(self, messages):
        import shutil

        if self.overwrite:
            for existing in os.listdir(self.path):
                if existing.endswith(".parquet") or existing == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, existing))
        # on append, carry forward the prior commit's shards so the
        # manifest stays the union of every committed shard (a fresh
        # manifest listing only this commit would drop earlier appends)
        shards = []
        prior_manifest = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(prior_manifest):
            try:
                with open(prior_manifest) as f:
                    shards = [
                        s
                        for s in json.load(f).get("shards", [])
                        if os.path.exists(os.path.join(self.path, s["shard"]))
                    ]
            except (OSError, ValueError):
                shards = []
        for m in messages:
            if not m.shard:
                continue
            os.rename(
                os.path.join(self.staging, m.shard),
                os.path.join(self.path, m.shard),
            )
            shards.append({"shard": m.shard, "n_rows": m.n_rows})
        has_existing = any(
            fn.endswith(".parquet") for fn in os.listdir(self.path)
        )
        if not shards and not has_existing:
            # all partitions were empty AND the directory holds no prior
            # shards: materialize one zero-row shard from the writer's
            # schema so spark.read.parquet on the output dir still
            # infers a schema (a manifest-only commit with no parquet
            # files would fail schema inference). When prior shards
            # exist, schema inference succeeds off them — never clobber
            # their manifest with a synthetic empty one.
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema

            name = "part-empty.parquet"
            pq.write_table(
                to_arrow_schema(self.schema).empty_table(),
                os.path.join(self.path, name),
            )
            shards.append({"shard": name, "n_rows": 0})
        if shards:
            shards.sort(key=lambda s: s["shard"])
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump(
                    {
                        "shards": shards,
                        "total_rows": sum(s["n_rows"] for s in shards),
                    },
                    f,
                    indent=2,
                )
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class ParquetPyStreamWriter(DataSourceStreamArrowWriter):
    """Streaming variant (DataSourceStreamArrowWriter): micro-batches
    arrive as RecordBatch iterators per task and commit per batchId
    with their own manifest — the Arrow-native streaming parquet sink.
    Combined with the replay_dist source this is a fully Arrow-columnar
    Python streaming pipe: no Python row objects anywhere."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("parquet_py sink requires a path")
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.staging, exist_ok=True)
        batches = list(iterator)
        if not batches:
            return ParquetPyCommit("", 0)
        name = f"part-{uuid.uuid4().hex}.parquet"
        table = pa.Table.from_batches(batches)
        pq.write_table(table, os.path.join(self.staging, name))
        return ParquetPyCommit(name, table.num_rows)

    def commit(self, messages, batchId: int):
        shards = []
        for m in messages:
            if m is None or not m.shard:
                continue
            os.rename(
                os.path.join(self.staging, m.shard),
                os.path.join(self.path, m.shard),
            )
            shards.append({"shard": m.shard, "n_rows": m.n_rows})
        shards.sort(key=lambda s: s["shard"])
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
        ) as f:
            json.dump(
                {
                    "batch_id": batchId,
                    "shards": shards,
                    "total_rows": sum(s["n_rows"] for s in shards),
                },
                f,
                indent=2,
            )
        try:
            os.rmdir(self.staging)  # only when drained; orphans kept
        except OSError:
            pass

    def abort(self, messages, batchId: int):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class ParquetPyWriterDataSource(DataSource):
    @classmethod
    def name(cls):
        return "parquet_py"

    def writer(self, schema: StructType, overwrite: bool):
        return ParquetPyWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ParquetPyStreamWriter(self.options, schema)


def register_parquet_py_writer(spark) -> None:
    try:
        spark.dataSource.register(ParquetPyWriterDataSource)
    except Exception:
        pass
