"""Round-8 locks: multi-probe mutual-kNN invariants, the TF-IDF run-length
rewrite's equivalence to explode+groupBy, and the shared cache
choreography's ordering guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.workload.vectors import (
    MKNN_PROBE_RADIUS,
    RP_PLANES,
    _probe_masks,
)

SF = "/root/testdata/sf0.001"


def test_probe_masks_cover_radius_exactly():
    masks = _probe_masks(8, 2)
    assert len(masks) == 1 + 8 + 28  # C(8,0)+C(8,1)+C(8,2)
    assert len(set(masks)) == len(masks)
    assert all(bin(m).count("1") <= 2 for m in masks)
    assert 0 in masks  # radius 0 = the vector's own bucket
    # radius grows monotonically
    assert len(_probe_masks(8, 1)) == 9
    assert len(_probe_masks(len(RP_PLANES), MKNN_PROBE_RADIUS)) == len(masks)


def test_mutual_knn_bucketed_pairs_are_reciprocal_and_hamming_bounded(spark):
    from epiteam_network_etl_functions_spark.operators.similarity import (
        rp_bucket_col,
    )
    from epiteam_network_etl_functions_spark.workload.vectors import (
        mutual_knn_bucketed,
    )

    pairs = mutual_knn_bucketed(spark, SF).collect()
    assert pairs, "bucketed mutual pairs must be non-degenerate at sf0.001"
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    buckets = {
        r.vec_id: r.bucket
        for r in emb.select(
            "vec_id", rp_bucket_col(F.col("embedding"), RP_PLANES).alias("bucket")
        ).collect()
    }
    for r in pairs:
        assert r.vec_id_a < r.vec_id_b
        assert -1.0 <= r.cosine <= 1.0
        ham = sum(
            x != y for x, y in zip(buckets[r.vec_id_a], buckets[r.vec_id_b])
        )
        assert ham <= MKNN_PROBE_RADIUS, (r.vec_id_a, r.vec_id_b, ham)


def test_mutual_knn_recall_audit_consistency(spark):
    from epiteam_network_etl_functions_spark.workload.vectors import (
        mutual_knn_recall_audit,
    )

    row = mutual_knn_recall_audit(spark, SF).collect()[0]
    assert row.n_common <= min(row.n_exact_pairs, row.n_bucketed_pairs)
    assert 0.0 <= row.pair_recall <= 1.0
    assert row.n_exact_pairs > 0  # audit is meaningful at this SF


def test_tfidf_rle_matches_explode_groupby(spark):
    """The row-local run-length term counts must equal the classic
    explode+groupBy on edge cases: empty text, repeated tokens, multiple
    consecutive spaces, single-token docs."""
    from epiteam_network_etl_functions_spark.operators.text import (
        tfidf_top_terms,
    )

    rows = [
        (1, "b a b  a b"),   # repeats + double space
        (2, ""),              # empty -> contributes to N but emits no terms
        (3, "   "),           # whitespace only
        (4, "z"),             # single token
        (5, "a a a a"),       # one term, tf 4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.term): (r.tf, r.df_docs)
        for r in tfidf_top_terms(df, "doc_id", "text", k=10).collect()
    }
    # reference counts via explode+groupBy
    toks = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").count().collect()
    exp_tf = {(r.doc_id, r.term): r["count"] for r in tf}
    df_docs = {}
    for (_, term), _n in exp_tf.items():
        df_docs[term] = df_docs.get(term, 0) + 1
    assert set(got) == set(exp_tf)
    for key, (tf_v, dfd_v) in got.items():
        assert tf_v == exp_tf[key], key
        assert dfd_v == df_docs[key[1]], key


def test_materialize_release_orders_checkpoint_before_unpersist(spark):
    from epiteam_network_etl_functions_spark.workload.text import (
        _materialize_release,
    )

    base = spark.range(100).withColumn("v", F.col("id") * 2).cache()
    base.count()
    assert base.storageLevel.useMemory
    out = _materialize_release(base.groupBy().sum("v"), base)
    # cache released...
    assert not base.storageLevel.useMemory
    # ...but the result was materialized first and survives the release
    assert out.collect()[0][0] == sum(2 * i for i in range(100))
