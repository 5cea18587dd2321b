"""Declarative data-quality rules — the reference's inline invariant
asserts (sizes sum to target size_scalers.py:48,100,160, tag count ==
node count NetworkBuilder.py:447, probs sum to 1 size_scalers.py:367;
SURVEY.md §5) generalized into a first-class operator a pipeline can run
after every stage.

`check_rules` evaluates every rule in ONE aggregation pass over ONE scan
(violation predicates become conditional counts; uniqueness becomes
count(*) - count(distinct struct)) and returns a long-format report
(rule, target, n_violations). No row is ever collected; at 100 TB the
report costs one map-side-combined aggregate, and gating a pipeline on it
is `report.where(n_violations > 0).isEmpty()`.

Null semantics: `not_null` is its own rule; the value rules (in_range /
in_set / matches) pass NULLs, so a nullable column doesn't double-report.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def not_null(col: str) -> tuple:
    return ("not_null", col)


def unique(*cols: str) -> tuple:
    return ("unique", ",".join(cols))


def in_range(col: str, lo, hi) -> tuple:
    """Closed range [lo, hi]."""
    return ("in_range", col, lo, hi)


def in_set(col: str, values: Sequence) -> tuple:
    return ("in_set", col, tuple(values))


def matches(col: str, regex: str) -> tuple:
    return ("matches", col, regex)


def _violations(rule: tuple) -> Column:
    kind = rule[0]
    if kind == "not_null":
        pred = F.col(rule[1]).isNull()
    elif kind == "unique":
        cols = rule[1].split(",")
        return F.count(F.lit(1)) - F.countDistinct(F.struct(*cols))
    elif kind == "in_range":
        c = F.col(rule[1])
        pred = c.isNotNull() & ((c < F.lit(rule[2])) | (c > F.lit(rule[3])))
    elif kind == "in_set":
        c = F.col(rule[1])
        pred = c.isNotNull() & ~c.isin(list(rule[2]))
    elif kind == "matches":
        c = F.col(rule[1])
        pred = c.isNotNull() & ~c.rlike(rule[2])
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    return F.count(F.when(pred, 1))


def check_rules(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """(rule, target, n_violations) — one row per rule, one pass over df."""
    aggs = [
        _violations(r).alias(f"__v{i}") for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    stack_rows = ", ".join(
        f"'{r[0]}', '{r[1]}', __v{i}" for i, r in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {stack_rows}) AS (rule, target, n_violations)"
    )


def assert_rules(df: DataFrame, rules: Sequence[tuple]) -> None:
    """Raise ValueError listing every violated rule (the stage-gate form)."""
    bad = check_rules(df, rules).where(F.col("n_violations") > 0).collect()
    if bad:
        details = ", ".join(
            f"{r['rule']}({r['target']})={r['n_violations']}" for r in bad
        )
        raise ValueError(f"data-quality violations: {details}")
