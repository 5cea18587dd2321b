"""JDBC source/sink round-trip against embedded Derby (bundled with the
Spark distribution — no network, no external server).

Closes the last reference-implied source: the reference's session wrapper
loads a JDBC driver jar (SparkWrapper.py:13-16) implying users had
spark.read.jdbc available; sources/io.py now carries read_jdbc/write_jdbc
with the parallel-read and connection-cap scale rules encoded.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.sources.io import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip(spark, derby_url):
    src = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2.5).alias("val"),
    )
    write_jdbc(src, derby_url, "t_roundtrip", driver=DRIVER, mode="overwrite")
    back = read_jdbc(spark, derby_url, "t_roundtrip", driver=DRIVER)
    assert back.count() == 100
    assert {c.lower() for c in back.columns} == {"k", "grp", "val"}
    assert back.agg(F.sum("k")).first()[0] == 4950


def test_jdbc_subquery_pushdown(spark, derby_url):
    src = spark.range(0, 50).select(F.col("id").alias("k"))
    write_jdbc(src, derby_url, "t_push", driver=DRIVER, mode="overwrite")
    # WHERE inside the dbtable subquery executes database-side. Spark
    # writes quoted (case-exact) identifiers, so the subquery must quote
    # them too — Derby folds unquoted names to uppercase.
    sub = '(SELECT "k" FROM t_push WHERE "k" < 10) s'
    got = read_jdbc(spark, derby_url, sub, driver=DRIVER)
    assert got.count() == 10
    assert got.agg(F.max("k")).first()[0] == 9


def test_jdbc_partitioned_read(spark, derby_url):
    src = spark.range(0, 200).select(F.col("id").alias("k"))
    write_jdbc(src, derby_url, "t_part", driver=DRIVER, mode="overwrite")
    got = read_jdbc(
        spark,
        derby_url,
        "t_part",
        driver=DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    # stride split covers every row exactly once and reads in parallel
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 200


def test_jdbc_predicates_read(spark, derby_url):
    src = spark.range(0, 60).select(F.col("id").alias("k"))
    write_jdbc(src, derby_url, "t_pred", driver=DRIVER, mode="overwrite")
    got = read_jdbc(
        spark,
        derby_url,
        "t_pred",
        driver=DRIVER,
        predicates=['"k" < 20', '"k" >= 20 AND "k" < 40', '"k" >= 40'],
    )
    assert got.rdd.getNumPartitions() == 3
    assert got.count() == 60
