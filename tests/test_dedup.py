"""Dedup kernel regressions (beyond the driver's oracle coverage)."""

from __future__ import annotations

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.operators.dedup import jaccard_verify


def test_jaccard_verify_ignores_duplicate_shingle_rows(spark):
    # doc 1 and doc 2 share {x, y} out of union {x, y, z} => J = 2/3.
    # doc 1's "x" appears 3 times: a collect_list would inflate |A| to 5
    # and deflate J to 2/(5+2-2)=0.4 — the set semantics must hold.
    shingled = spark.createDataFrame(
        [Row(doc_id=1, shingle=s) for s in ["x", "x", "x", "y", "z"]]
        + [Row(doc_id=2, shingle=s) for s in ["x", "y"]]
    )
    cands = spark.createDataFrame([Row(a_id=1, b_id=2)])
    out = jaccard_verify(cands, shingled, "doc_id", threshold=0.0).collect()
    assert len(out) == 1
    assert abs(out[0]["jaccard"] - 2 / 3) < 1e-6
