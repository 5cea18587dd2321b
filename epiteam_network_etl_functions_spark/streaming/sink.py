"""Incrementally-maintained table sink: foreachBatch + the CDC upsert.

Structured Streaming's parquet sink is append-only; a live feed that
re-lands rows (retries, corrections, late updates) needs MERGE semantics
at the sink. Lakehouse formats do this natively; their jars are not in
this image, so the sink composes the engine's own MERGE equivalent
(operators/cdc.upsert_latest) inside foreachBatch:

    per micro-batch:  table <- top1_per_key(table ∪ batch)   (latest wins)

written via an A/B directory swap — parquet cannot overwrite a directory
that is simultaneously being read, and a crash mid-write must never
leave the table half-replaced. A pointer file names the live copy; the
swap is pointer-rewrite, so readers resolve a complete table at every
instant and a re-run of a failed batch is idempotent (latest-wins makes
replays converge).

Scale note: each batch rewrites the table once (read + window + write) —
the right shape while table size is O(batch × horizon). At true 100 TB
table sizes the same foreachBatch body targets a partitioned layout and
rewrites only the partitions the batch touches (or a lakehouse MERGE);
the streaming-side contract (idempotent latest-wins per key) is
unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import upsert_latest

_POINTER = "_CURRENT"


def read_upsert_table(spark: SparkSession, path: str) -> DataFrame | None:
    """Resolve the live copy via the pointer file (None before first batch)."""
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        live = f.read().strip()
    return spark.read.parquet(os.path.join(path, live))


def upsert_sink(
    stream: DataFrame,
    path: str,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start a streaming query maintaining a latest-wins keyed table at
    ``path``. Returns the StreamingQuery (caller awaits termination)."""
    keys = list(key_cols)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = read_upsert_table(spark, path)
        merged = (
            upsert_latest(current, batch, keys, ts_col, tiebreak_col)
            if current is not None
            else upsert_latest(
                batch.limit(0), batch, keys, ts_col, tiebreak_col
            )
        )
        ptr = os.path.join(path, _POINTER)
        live = ""
        if os.path.exists(ptr):
            with open(ptr) as f:
                live = f.read().strip()
        nxt = "b" if live == "a" else "a"
        merged.write.mode("overwrite").parquet(os.path.join(path, nxt))
        with open(ptr, "w") as f:  # atomic enough: single small write
            f.write(nxt)

    os.makedirs(path, exist_ok=True)
    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
