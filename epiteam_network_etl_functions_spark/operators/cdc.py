"""Incremental-update operators (CDC / SCD2 emulation without Delta).

A 100 TB training-data pipeline re-lands slices daily; these kernels are
the parquet-only equivalents of MERGE INTO (the lakehouse formats' jars
are not in this image — gated behind plain DataFrame algebra per the
anti-join + union + window recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .winners import top1_per_key


def upsert_latest(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Latest-wins upsert: one surviving row per key across both inputs,
    by (ts DESC, tiebreak DESC). Equivalent to MERGE ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT for full-row updates."""
    all_rows = current.unionByName(updates)
    return top1_per_key(
        all_rows, key_cols, [F.desc(ts_col), F.desc(tiebreak_col)]
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the open row of every key
    touched by `updates` (valid_to = update ts) and append the update as
    the new open row (valid_to = NULL).

    `history` columns: key_cols + payload + valid_from + valid_to (NULL for
    open rows). `updates` columns: key_cols + payload + ts_col.
    One shuffle on the key; untouched keys pass through unchanged.

    Multiple updates for one key in a batch chain correctly: each version
    is closed by the next one (lead over the key window); only the latest
    stays open. Out-of-order protection: an update older than the open
    row's valid_from clamps the close to valid_from (zero-length interval)
    rather than emitting an inverted one — late CDC feeds should be
    pre-filtered upstream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.asc(valid_from))
    upd_keyed = (
        updates.withColumnRenamed(ts_col, valid_from)
        .withColumn("__next_from", F.lead(valid_from).over(w))
        .withColumn(
            valid_to,
            F.col("__next_from").cast(history.schema[valid_to].dataType),
        )
        .drop("__next_from")
    )
    first_update = top1_per_key(
        upd_keyed.select(*key_cols, valid_from), key_cols, [F.asc(valid_from)]
    ).select(*key_cols, F.col(valid_from).alias("__close_at"))

    open_rows = history.where(F.col(valid_to).isNull())
    closed_rows = history.where(F.col(valid_to).isNotNull())

    newly_closed = open_rows.join(first_update, key_cols, "inner").withColumn(
        valid_to, F.greatest(F.col("__close_at"), F.col(valid_from))
    ).drop("__close_at")
    untouched_open = open_rows.join(first_update, key_cols, "left_anti")

    return (
        closed_rows.unionByName(newly_closed)
        .unionByName(untouched_open)
        .unionByName(upd_keyed.select(*closed_rows.columns))
    )
