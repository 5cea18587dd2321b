"""As-of joins (backward / forward / nearest) — temporal operators Spark
lacks natively; together they cover pandas merge_asof's direction surface.

Implemented as the union+window idiom (the scalable alternative to
per-group merge_asof): tag left/right rows, sort within the key partition
by (ts, side), and carry the last-seen right row forward with
last(ignorenulls). One shuffle on the key — same cost as a regular join —
and no state blow-up on skewed keys beyond the window sort. Forward is
the same scan over the reversed ordering; nearest computes both fills off
ONE exchange (two sorts) and picks the closer timestamp per row.

Semantics: backward pairs each left row with the greatest right_ts <=
left_ts; forward with the least right_ts >= left_ts (equal ts matches in
both); nearest with whichever is closer by |Δts|, ties to the backward row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right payload at or
    before its timestamp (NULLs when no prior right row exists)."""
    keys = list(key_cols)
    # All payload columns travel in ONE struct so a single
    # last(ignorenulls=True) carries them together: every asof_* output
    # column comes from the SAME right row, and a right row whose latest
    # value for some column is legitimately NULL keeps that NULL (it is
    # never back-filled from an older row, which per-column last() would do).
    r_payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    l_tag = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).alias("__rrow"),
        F.struct(*[c for c in left.columns if c not in keys and c != ts_col]).alias(
            "__lrow"
        ),
    )
    r_tag = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        r_payload.alias("__rrow"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
    )
    l_tag = l_tag.withColumn("__rrow", F.col("__rrow").cast(r_tag.schema["__rrow"].dataType))
    u = l_tag.unionByName(r_tag)
    # right rows (__side=0) sort before left rows at equal ts => <= semantics.
    # The payload struct extends the ordering so ties among right rows with
    # identical (key, ts) resolve deterministically (last struct wins) —
    # callers that need oracle-exact results should still deduplicate the
    # right side to unique (key, ts) first, since SQL ASOF JOIN's pick among
    # exact ts duplicates is engine-defined.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("__side").asc(),
            F.col("__rrow").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *keys,
        ts_col,
        "__side",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rfill"),
    )
    out = filled.where(F.col("__side") == 1).drop("__side")
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__rfill.{c}"))
    out = out.drop("__rfill")
    # unpack the left payload back to top-level columns
    for field in out.schema["__lrow"].dataType.fieldNames():
        out = out.withColumn(field, F.col(f"__lrow.{field}"))
    return out.drop("__lrow")


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    with_right_ts: bool = False,
):
    """Shared tagging for all directions. The right payload travels in one
    struct (see asof_join_backward); nearest additionally needs the right
    timestamp inside the struct to measure |Δts|."""
    payload_fields = [F.col(c).alias(c) for c in payload_cols]
    if with_right_ts:
        payload_fields = [F.unix_micros(F.col(ts_col)).alias("__rts_us")] + payload_fields
    r_payload = F.struct(*payload_fields)
    l_tag = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).alias("__rrow"),
        F.struct(*[c for c in left.columns if c not in keys and c != ts_col]).alias(
            "__lrow"
        ),
    )
    r_tag = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        r_payload.alias("__rrow"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
    )
    l_tag = l_tag.withColumn(
        "__rrow", F.col("__rrow").cast(r_tag.schema["__rrow"].dataType)
    )
    return l_tag.unionByName(r_tag)


def _unpack(out: DataFrame, payload_cols: Sequence[str], prefix: str, fill: str):
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"{fill}.{c}"))
    out = out.drop(fill)
    for field in out.schema["__lrow"].dataType.fieldNames():
        out = out.withColumn(field, F.col(f"__lrow.{field}"))
    return out.drop("__lrow")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join, forward direction: every left row + the earliest
    right payload at or after its timestamp (NULLs when none follows).
    The backward scan over the reversed ordering: descending ts, right
    rows first at equal ts (so >= is inclusive), running last non-null."""
    keys = list(key_cols)
    u = _tagged_union(left, right, keys, ts_col, payload_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).desc(),
            F.col("__side").asc(),
            F.col("__rrow").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *keys,
        ts_col,
        "__side",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rfill"),
    )
    out = filled.where(F.col("__side") == 1).drop("__side")
    return _unpack(out, payload_cols, prefix, "__rfill")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join, nearest direction: the right row minimizing
    |right_ts - left_ts|; equidistant ties take the backward (earlier)
    row, matching pandas merge_asof. Both direction fills are computed
    over the SAME key partitioning — one exchange, two in-partition
    sorts — then the closer one is chosen per row arithmetically."""
    keys = list(key_cols)
    u = _tagged_union(left, right, keys, ts_col, payload_cols, with_right_ts=True)
    order_tail = [F.col("__side").asc(), F.col("__rrow").asc_nulls_first()]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).desc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *keys,
        ts_col,
        "__side",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w_back).alias("__bfill"),
        F.last("__rrow", ignorenulls=True).over(w_fwd).alias("__ffill"),
    )
    rows = filled.where(F.col("__side") == 1).drop("__side")
    l_us = F.unix_micros(F.col(ts_col))
    dist_b = l_us - F.col("__bfill.__rts_us")
    dist_f = F.col("__ffill.__rts_us") - l_us
    chosen = (
        F.when(F.col("__bfill").isNull(), F.col("__ffill"))
        .when(F.col("__ffill").isNull(), F.col("__bfill"))
        .when(dist_f < dist_b, F.col("__ffill"))
        .otherwise(F.col("__bfill"))  # ties -> backward
    )
    out = rows.withColumn("__nfill", chosen).drop("__bfill", "__ffill")
    return _unpack(out, payload_cols, prefix, "__nfill")
