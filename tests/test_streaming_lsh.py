"""Streaming MinHash/LSH near-dup detection vs the batch chain.

The streaming candidate set must equal the batch lsh_candidate_pairs
output on the same corpus (same hash family, same band keys), including
pairs whose members arrive in different microbatches (state carry)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epiteam_network_etl_functions_spark.operators.dedup import (
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
)
from epiteam_network_etl_functions_spark.operators.text import explode_shingles
from epiteam_network_etl_functions_spark.streaming.lsh import (
    rowwise_minhash,
    streaming_lsh_candidates,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _corpus():
    """Near-dup families (shared long prefix), singletons, and one exact
    duplicate pair; 5-token minimum so 3-shingles exist."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    did = 0
    for fam in range(4):
        stem = f"{base} family{fam} token alpha beta gamma delta epsilon"
        for var in range(3):
            rows.append((did, f"{stem} variant{var}", T0 + dt.timedelta(seconds=did)))
            did += 1
    for s in range(6):  # unrelated singletons
        words = " ".join(f"unique{s}w{j}" for j in range(12))
        rows.append((did, words, T0 + dt.timedelta(seconds=did)))
        did += 1
    rows.append((did, rows[0][1], T0 + dt.timedelta(seconds=did)))  # exact dup of doc 0
    return rows


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_corpus(), SCHEMA)


def test_rowwise_minhash_matches_batch(spark, corpus_df):
    """The no-shuffle per-row signature == the batch groupBy-MIN signature."""
    batch = minhash_signatures(
        explode_shingles(corpus_df, "doc_id", "text"), "doc_id"
    )
    packed = rowwise_minhash(corpus_df, "doc_id", "text", "ts")
    unpacked = packed.select(
        "doc_id",
        *[
            F.expr(f"element_at(split(sig, '[|]'), {i + 1})").alias(f"mh{i}")
            for i in range(16)
        ],
    )
    b = {r["doc_id"]: r for r in batch.collect()}
    for r in unpacked.collect():
        want = b[r["doc_id"]]
        for i in range(16):
            assert r[f"mh{i}"] == want[f"mh{i}"], (r["doc_id"], i)


def _run_stream(spark, src_dir, checkpoint, name, **kw):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple microbatches
        .parquet(src_dir)
    )
    cands = streaming_lsh_candidates(stream, **kw)
    q = (
        cands.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_candidates_match_batch(spark, corpus_df, tmp_path):
    rows = _corpus()
    # two files -> two microbatches: family pairs must cross the state
    mid = len(rows) // 2
    spark.createDataFrame(rows[:mid], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "src"))
    spark.createDataFrame(rows[mid:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "src"))

    out = _run_stream(
        spark, str(tmp_path / "src"), str(tmp_path / "ckpt"), "lsh_stream_out"
    )

    got = {(r["a_id"], r["b_id"]) for r in out.collect()}
    batch = lsh_candidate_pairs(
        lsh_bands(
            minhash_signatures(
                explode_shingles(corpus_df, "doc_id", "text"), "doc_id"
            ),
            "doc_id",
        ),
        "doc_id",
    )
    want = {(r["a_id"], r["b_id"]) for r in batch.collect()}
    assert want, "corpus must produce batch candidates"
    assert got == want

    # exact duplicate pair carries a perfect signature estimate
    dup_pair = (0, rows[-1][0])
    est = {
        (r["a_id"], r["b_id"]): r["est_jaccard"]
        for r in out.collect()
    }
    assert est[dup_pair] == 1.0


def test_hot_bucket_cap_fifo(spark, tmp_path):
    """4 identical docs, max_bucket=2: FIFO eviction drops exactly the
    (first, fourth) pairing; the other five pairs survive."""
    text = "same same same words words words again again again more more more"
    rows = [(i, text, T0 + dt.timedelta(seconds=i)) for i in range(4)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "src")
    )
    out = _run_stream(
        spark, str(tmp_path / "src"), str(tmp_path / "ckpt"), "lsh_cap_out",
        max_bucket=2,
    )
    got = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}
