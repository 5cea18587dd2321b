"""Differential lock on the engine-portable hash: the Spark expression
(operators/sampling.hash_bucket) must match an independent pure-Python
md5 reimplementation for arbitrary ids, salts, and bucket counts — this
hash is the foundation under the train/val/test splits, the pings
lat/lon derivation, and the round-12 Bloom filter, so a silent
divergence would shift EVERY downstream certified row."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st


def _py_hash_bucket(value, buckets: int, salt: str = "") -> int:
    """Independent reimplementation: md5 of 'salt:str(value)' utf-8,
    first 12 hex chars as a base-16 integer, mod buckets."""
    h = hashlib.md5(f"{salt}:{value}".encode("utf-8")).hexdigest()
    return int(h[:12], 16) % buckets


@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    buckets=st.sampled_from([2, 7, 100, 8192, 1 << 20]),
    salt=st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127
        ),
        max_size=8,
    ),
)
@settings(max_examples=12, deadline=None)
def test_spark_hash_matches_python(spark_session_holder, ids, buckets, salt):
    spark = spark_session_holder
    from epiteam_network_etl_functions_spark.operators.sampling import (
        hash_bucket,
    )

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id", hash_bucket(F.col("id"), buckets, salt).alias("b")
        ).collect()
    }
    want = {i: _py_hash_bucket(i, buckets, salt) for i in ids}
    assert got == want


# hypothesis re-runs the function body many times; a session-scoped
# fixture must be resolved once OUTSIDE the given() loop
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


def test_duckdb_hash_sql_matches_python():
    import duckdb

    from epiteam_network_etl_functions_spark.workload.extended import (
        _hash_bucket_sql,
    )

    con = duckdb.connect()
    for value in (0, 1, 7, 12345, 987654321, -42):
        for buckets, salt in ((100, "split"), (8192, "bf1"), (2000, "lat")):
            sql = f"SELECT {_hash_bucket_sql(str(value), buckets, salt)}"
            got = con.execute(sql).fetchone()[0]
            assert got == _py_hash_bucket(value, buckets, salt), (
                value,
                buckets,
                salt,
            )
