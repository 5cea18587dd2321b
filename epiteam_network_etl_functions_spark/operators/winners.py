"""Winner / argmax-per-key kernel (reference W2+W4).

The reference's most-reused shape: score rows, then
``ROW_NUMBER() OVER (PARTITION BY caid ORDER BY score DESC) = 1``
(ntl_queries.py:41-47, HomeAgebGenerator.py:130-134, NTLTransforms.py:120-126,
IndexingHomeAgebs.py:75-78). Design anchor is the reference's own Spark
variant (NTLTransforms.py) since it is already idiomatic.

Determinism note: every ordering gets explicit tie-break columns — the
reference relies on engine-stable sorts; we do not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top1_per_key(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Keep the single best row per key group under ``order_by``.

    ``order_by`` must be a deterministic total order within each group
    (include a tie-break column).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def category_winner(
    df: DataFrame,
    key: str,
    category: str,
    score: Column | None = None,
    out_category: str = "winner",
    out_score: str = "score",
) -> DataFrame:
    """Per ``key``, the ``category`` with the highest score (default: row
    count), ties broken by category ascending.

    This is the home-location inference kernel: count night pings per
    (device, cell), keep the argmax cell (ntl_queries.py:12-48).
    """
    agg = F.count(F.lit(1)) if score is None else score
    scored = df.groupBy(key, category).agg(agg.alias(out_score))
    won = top1_per_key(
        scored, [key], [F.desc(out_score), F.asc(category)]
    )
    return won.select(F.col(key), F.col(category).alias(out_category), F.col(out_score))
