"""As-of (backward) join — a temporal operator Spark lacks natively.

Implemented as the union+window idiom (the scalable alternative to
per-group merge_asof): tag left/right rows, sort within the key partition
by (ts, side), and carry the last-seen right row forward with
last(ignorenulls). One shuffle on the key — same cost as a regular join —
and no state blow-up on skewed keys beyond the window sort.

Semantics: for each left row, the right row with the greatest right_ts such
that right_ts <= left_ts (ties on ts: the right row wins, i.e. <= not <).
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
