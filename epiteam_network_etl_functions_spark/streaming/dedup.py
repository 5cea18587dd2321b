"""Streaming deduplication — the live-ingest half of the dedup surface
(operators/dedup.py is the batch half).

A training-data feed re-lands the same documents (retries, multi-source
crawl overlap); dropping exact duplicates at ingest is cheaper than any
batch dedup afterwards. Spark's `dropDuplicates` on a stream keeps ALL
seen keys in state forever; the watermarked form
(`dropDuplicatesWithinWatermark`) bounds state to the watermark horizon —
the only shape that survives an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct content digest within the
    watermark horizon. The digest is computed (not the raw text) so the
    dedup state stores 32-byte keys, never documents — at 100 TB the state
    size is #distinct-docs-per-horizon × 32 B per partition, and the
    digest groupBy shuffles only (digest, row) once.

    Duplicates that re-arrive *later* than the watermark horizon pass
    through (state for their digest has been evicted) — the standard
    streaming-dedup contract; a periodic batch `exact_dedup_groups` pass
    sweeps those.

    NULL text is NOT deduplicated: md5(NULL) is NULL and the stateful
    dedup treats null keys as equal, which would silently collapse every
    decode-failure row into one survivor — each null row gets a unique
    surrogate digest and passes through instead.
    """
    digested = stream.withColumn(
        "__digest",
        F.coalesce(
            F.md5(F.col(text_col).cast("binary")),
            F.concat(F.lit("∅:"), F.expr("uuid()")),
        ),
    )
    return (
        digested.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
