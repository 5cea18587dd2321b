"""check_rules / assert_rules (operators/quality.py)."""

from __future__ import annotations

import pytest

from epiteam_network_etl_functions_spark.operators.quality import (
    assert_rules,
    check_rules,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "x1"),
            (2, "a", -5.0, "x2"),   # in_range violation
            (3, None, 50.0, "y3"),  # not_null violation; null passes in_set
            (1, "b", 300.0, "x4"),  # dup id; in_range violation
            (5, "zz", None, "x5"),  # in_set violation; null value passes range
        ],
        "id bigint, tag string, value double, code string",
    )


def test_counts(df):
    report = {
        (r["rule"], r["target"]): r["n_violations"]
        for r in check_rules(
            df,
            [
                not_null("tag"),
                unique("id"),
                unique("id", "tag"),
                in_range("value", 0, 250),
                in_set("tag", ("a", "b")),
                matches("code", "^x"),
            ],
        ).collect()
    }
    assert report[("not_null", "tag")] == 1
    assert report[("unique", "id")] == 1
    assert report[("unique", "id,tag")] == 0
    assert report[("in_range", "value")] == 2
    assert report[("in_set", "tag")] == 1
    assert report[("matches", "code")] == 1


def test_one_pass_plan(df):
    plan = (
        check_rules(df, [not_null("tag"), in_range("value", 0, 250), unique("id")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Scan") <= 1


def test_assert_rules_raises(df):
    with pytest.raises(ValueError, match=r"unique\(id\)=1"):
        assert_rules(df, [unique("id")])
    assert_rules(df, [unique("id", "tag")])  # clean rule: no raise
