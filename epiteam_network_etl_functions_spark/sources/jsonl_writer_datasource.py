"""JSONL sink as a Spark 4 Python DataSource WRITER — the write half of
the Python DataSource API (every other Python DataSource here is a
reader; this one certifies the two-phase task-commit protocol).

    spark.dataSource.register(JsonlWriterDataSource)
    df.write.format("jsonl_py").mode("append").save("/out/dir")

Protocol (the same shape a production object-store sink uses):

- each TASK streams its partition to a staging file
  ``_staging/part-<uuid>.jsonl`` and returns a commit message carrying
  the staged name and row count — tasks never publish directly, so a
  retried/zombie task can at worst leave an orphan in staging;
- ``commit`` (driver, runs once after every task succeeded) atomically
  renames the staged shards into the target directory and writes
  ``_MANIFEST.json`` (sorted shard list + per-shard and total row
  counts) — readers that trust only manifested shards get exactly-once
  output even after task retries;
- ``abort`` removes the staging area.

JSON encoding: one object per line, keys in schema order, ``ensure_ascii``
off (UTF-8), so ``spark.read.json`` round-trips losslessly for the
string/int/double columns the corpus pipeline ships
(``python_writer_roundtrip`` is the driver-certified lock).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, shard: str, n_rows: int):
        self.shard = shard
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_py sink requires a path")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.staging, name), "w", encoding="utf-8") as f:
            for row in iterator:
                obj = {k: row[k] for k in self.fields}
                f.write(json.dumps(obj, ensure_ascii=False))
                f.write("\n")
                n += 1
        return JsonlCommitMessage(name, n)

    def commit(self, messages):
        import shutil

        if self.overwrite:
            for existing in os.listdir(self.path):
                if existing.endswith(".jsonl") or existing == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, existing))
        # on append, carry forward the prior commit's shards so the
        # manifest stays the union of every committed shard (same fix
        # as the parquet_py sink, round 14 — a fresh manifest listing
        # only this commit would drop earlier appends from any
        # manifest-trusting reader)
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
            os.rename(
                os.path.join(self.staging, m.shard),
                os.path.join(self.path, m.shard),
            )
            shards.append({"shard": m.shard, "n_rows": m.n_rows})
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


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming variant: same staging -> rename protocol, but commits
    are PER MICRO-BATCH (``commit(messages, batchId)``) and each batch
    writes its own manifest ``_MANIFEST-<batchId>.json`` — the
    idempotence handle a restarted batch needs (a replayed batchId
    overwrites its own manifest, never another batch's shards get
    double-counted by a manifest-trusting reader)."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_py sink requires a path")
        self.fields = [f.name for f in schema.fields]
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator):
        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.staging, name), "w", encoding="utf-8") as f:
            for row in iterator:
                obj = {k: row[k] for k in self.fields}
                f.write(json.dumps(obj, ensure_ascii=False))
                f.write("\n")
                n += 1
        return JsonlCommitMessage(name, n)

    def commit(self, messages, batchId: int):
        shards = []
        for m in messages:
            if m is None:
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
        # drop the staging dir when this batch drained it completely;
        # non-empty means an orphan from a failed attempt — keep it for
        # inspection rather than deleting silently
        try:
            os.rmdir(self.staging)
        except OSError:
            pass

    def abort(self, messages, batchId: int):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class JsonlWriterDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_py"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlStreamWriter(self.options, schema)


def register_jsonl_writer(spark) -> None:
    try:
        spark.dataSource.register(JsonlWriterDataSource)
    except Exception:
        pass
