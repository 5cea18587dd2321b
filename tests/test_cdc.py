"""CDC / SCD2 emulation kernels."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.operators.cdc import scd2_apply, upsert_latest


def _d(day):
    return dt.datetime(2024, 1, day)


def test_upsert_latest_wins(spark):
    current = spark.createDataFrame(
        [Row(k=1, v="old", ts=_d(1), seq=1), Row(k=2, v="keep", ts=_d(1), seq=1)]
    )
    updates = spark.createDataFrame(
        [Row(k=1, v="new", ts=_d(5), seq=2), Row(k=3, v="ins", ts=_d(5), seq=1)]
    )
    out = {r["k"]: r["v"] for r in upsert_latest(current, updates, ["k"], "ts", "seq").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_tiebreak_deterministic(spark):
    current = spark.createDataFrame([Row(k=1, v="a", ts=_d(1), seq=1)])
    updates = spark.createDataFrame([Row(k=1, v="b", ts=_d(1), seq=2)])
    out = upsert_latest(current, updates, ["k"], "ts", "seq").collect()
    assert len(out) == 1 and out[0]["v"] == "b"  # same ts -> higher seq wins


def test_scd2_apply(spark):
    history = spark.createDataFrame(
        [
            Row(k=1, v="v1", valid_from=_d(1), valid_to=_d(3)),
            Row(k=1, v="v2", valid_from=_d(3), valid_to=None),
            Row(k=2, v="w1", valid_from=_d(1), valid_to=None),
        ]
    )
    updates = spark.createDataFrame([Row(k=1, v="v3", ts=_d(7))])
    out = scd2_apply(history, updates, ["k"], "ts")
    rows = sorted(
        [(r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in out.collect()]
    )
    assert rows == [
        (1, "v1", _d(1), _d(3)),
        (1, "v2", _d(3), _d(7)),   # open row closed at update ts
        (1, "v3", _d(7), None),    # new open row
        (2, "w1", _d(1), None),    # untouched key passes through
    ]
    # exactly one open row per key
    opens = out.where("valid_to IS NULL").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_normalize_text(spark):
    from epiteam_network_etl_functions_spark.operators.textnorm import (
        normalize_text,
        normalized_key,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="H\u00e9llo   W\u00f6rld "),
            Row(doc_id=2, text="hello world"),
            Row(doc_id=3, text=None),
        ]
    )
    out = {r["doc_id"]: r["text_norm"] for r in normalize_text(df, "text").collect()}
    assert out[1] == "hello world" == out[2]
    assert out[3] is None
    keys = df.select("doc_id", normalized_key("text").alias("k")).collect()
    kmap = {r["doc_id"]: r["k"] for r in keys}
    assert kmap[1] == kmap[2]  # accent/width/case variants dedupe together


def test_stratified_sample_deterministic(spark):
    from epiteam_network_etl_functions_spark.operators.sampling import (
        stratified_sample,
    )
    from epiteam_network_etl_functions_spark import catalog
    from tests.conftest import PARITY_SF_DIR

    docs = catalog.load(spark, PARITY_SF_DIR, "documents")
    frac = {"en": 0.5, "es": 0.1}
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", "doc_id", frac).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(13), "lang", "doc_id", frac).collect()}
    assert a == b  # stable under repartitioning (sampleBy is not)
    by_lang = stratified_sample(docs, "lang", "doc_id", frac).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in by_lang}
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(got) <= {"en", "es"}
    assert 0.3 * totals["en"] <= got.get("en", 0) <= 0.7 * totals["en"]


def test_scd2_multi_update_same_batch_chains(spark):
    history = spark.createDataFrame(
        [(1, "v1", _d(1), None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [Row(k=1, v="v5", ts=_d(5)), Row(k=1, v="v7", ts=_d(7))]
    )
    out = scd2_apply(history, updates, ["k"], "ts")
    rows = sorted((r["v"], r["valid_from"], r["valid_to"]) for r in out.collect())
    assert rows == [
        ("v1", _d(1), _d(5)),
        ("v5", _d(5), _d(7)),  # chained: closed by the NEXT update
        ("v7", _d(7), None),
    ]
    assert out.where("valid_to IS NULL").count() == 1


def test_scd2_late_update_never_inverts_interval(spark):
    history = spark.createDataFrame(
        [(1, "v5", _d(5), None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    late = spark.createDataFrame([Row(k=1, v="v3", ts=_d(3))])
    out = scd2_apply(history, late, ["k"], "ts")
    for r in out.collect():
        if r["valid_to"] is not None:
            assert r["valid_to"] >= r["valid_from"]  # clamped, not inverted

