"""Contact-probability matrix pipeline (reference A1, J4, A2, J5, F13).

sizes -> total possible contacts (cross join, size_a*size_b) -> observed
contacts (pair counts grouped by home blocks) -> outer-completed
total-vs-observed -> probability = observed/total.
(matrix_queries.py:6-21, matrix_transforms.py:36-122, NetworkBuilder.py:88-262)

Scale notes: `sizes` is one row per block (n_blocks ≈ 10³ in the reference),
so the cross join is n_blocks² — small — and every join against it is
broadcast. The reference's semantics are kept exactly, including the quirk
that total = size*size counts self-pairs while observed counts ordered
distinct pairs (SURVEY.md §7 "ragged semantics" — replicated, not fixed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_sizes(df: DataFrame, block_col: str, id_col: str, out_col: str = "size") -> DataFrame:
    """COUNT(DISTINCT id) per block (matrix_queries.py:17-19). Exact distinct,
    as the reference; swap to approx_count_distinct only if a caller opts in."""
    return df.groupBy(block_col).agg(F.countDistinct(id_col).alias(out_col))


def total_contacts(sizes: DataFrame, block_col: str, size_col: str = "size") -> DataFrame:
    """All block pairs with size_a*size_b (matrix_transforms.py:42-54)."""
    a = sizes.select(
        F.col(block_col).alias(f"a_{block_col}"), F.col(size_col).alias("__a_size")
    )
    b = sizes.select(
        F.col(block_col).alias(f"b_{block_col}"), F.col(size_col).alias("__b_size")
    )
    return a.crossJoin(b).select(
        f"a_{block_col}",
        f"b_{block_col}",
        (F.col("__a_size") * F.col("__b_size")).cast("bigint").alias("total_pairs"),
    )


def observed_contacts(
    pairs: DataFrame,
    homes: DataFrame,
    pair_a: str,
    pair_b: str,
    home_key: str,
    home_val: str,
) -> DataFrame:
    """Attach each endpoint's home block and count ordered pairs per block
    pair (NetworkBuilder.py:155-211). `homes` is one row per id — small; both
    attaches are broadcast joins."""
    ha = F.broadcast(
        homes.select(F.col(home_key).alias(pair_a), F.col(home_val).alias(f"a_{home_val}"))
    )
    hb = F.broadcast(
        homes.select(F.col(home_key).alias(pair_b), F.col(home_val).alias(f"b_{home_val}"))
    )
    return (
        pairs.join(ha, pair_a)
        .join(hb, pair_b)
        .groupBy(f"a_{home_val}", f"b_{home_val}")
        .agg(F.count(F.lit(1)).alias("observed"))
    )


def total_vs_observed(
    total: DataFrame, observed: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Left join totals with observed, NULL -> 0 (matrix_transforms.py:99-122,
    NetworkBuilder.py:213-262)."""
    return total.join(F.broadcast(observed), on=[a_col, b_col], how="left").select(
        a_col,
        b_col,
        "total_pairs",
        F.coalesce(F.col("observed"), F.lit(0)).cast("bigint").alias("observed"),
    )


def contact_probs(tvo: DataFrame, a_col: str, b_col: str, digits: int = 6) -> DataFrame:
    """prob = observed/total with a zero-total guard (NetworkBuilder.py:297-317).
    Rounded so float formatting is oracle-stable."""
    prob = F.when(
        F.col("total_pairs") > 0, F.col("observed") / F.col("total_pairs")
    ).otherwise(F.lit(0.0))
    return tvo.select(
        a_col, b_col, "total_pairs", "observed", F.round(prob, digits).alias("prob")
    )
