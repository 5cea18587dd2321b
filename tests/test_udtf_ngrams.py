"""Differential lock: the Spark 4 Python UDTF n-gram expander emits
exactly the rows of the JVM-side explode kernel (the production path),
on real documents and on edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.functions.udtf_ngrams import (
    ngrams_via_kernel,
    register_ngram_udtf,
)
from epiteam_network_etl_functions_spark.session import prep

SF = "/root/testdata/sf0.001"


def _udtf_rows(spark, df, text_col, n):
    register_ngram_udtf(spark)
    df.select(F.col(text_col).alias("t")).createOrReplaceTempView(
        "__udtf_in"
    )
    return spark.sql(
        f"SELECT g.pos, g.ngram FROM __udtf_in, "
        f"LATERAL word_ngrams(t, {n}) g"
    )


def test_udtf_matches_kernel_on_documents(spark):
    prep(spark)
    docs = catalog.load(spark, SF, "documents").limit(100)
    for n in (1, 2, 3):
        got = sorted(
            (r["pos"], r["ngram"])
            for r in _udtf_rows(spark, docs, "text", n).collect()
        )
        want = sorted(
            (r["pos"], r["ngram"])
            for r in ngrams_via_kernel(docs, "text", n).collect()
        )
        assert got == want, f"n={n}: udtf diverges from kernel"
        assert got, f"n={n}: empty expansion on real docs"


def test_udtf_edge_cases(spark):
    df = spark.createDataFrame(
        [("a",), ("a b",), ("",), (None,), ("  a   b  ",)], "text string"
    )
    got = sorted(
        (r["pos"], r["ngram"])
        for r in _udtf_rows(spark, df, "text", 2).collect()
    )
    want = sorted(
        (r["pos"], r["ngram"])
        for r in ngrams_via_kernel(df.where(F.col("text").isNotNull()), "text", 2).collect()
    )
    assert got == want == [(0, "a b"), (0, "a b")]
