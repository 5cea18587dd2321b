"""Materialized IVF index: partition-pruned probe path (the 100 TB ANN
story, previously documented but not demonstrated). Asserts the probe's
plan carries the centroid PartitionFilter, that only the probed
centroid's files are scanned, and that results match the inline
(unpruned) IVF probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.operators.similarity import (
    as_double,
    ivf_assign,
    ivf_materialize,
    ivf_probe_pruned,
    ivf_probe_topk,
)
from epiteam_network_etl_functions_spark.session import prep

SF_DIR = "/root/testdata/sf0.001"
N_SEEDS = 8
PROBE_VEC_ID = 42


@pytest.fixture(scope="module")
def ivf_path(spark, tmp_path_factory):
    prep(spark)
    e = catalog.load(spark, SF_DIR, "embeddings")
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_materialize(e, seeds, path, "vec_id", "embedding")
    return path


def _query_setup(spark):
    e = catalog.load(spark, SF_DIR, "embeddings")
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    qrow = (
        e.where(F.col("vec_id") == PROBE_VEC_ID)
        .select(as_double(F.col("embedding")).alias("v"))
        .head()
    )
    assignments = ivf_assign(e, seeds, "vec_id", "embedding")
    cid = (
        assignments.where(F.col("vec_id") == PROBE_VEC_ID)
        .select("centroid_id")
        .head()[0]
    )
    return e, seeds, qrow[0], cid


def test_probe_plan_has_partition_filter(spark, ivf_path):
    _, _, qvec, cid = _query_setup(spark)
    probe = ivf_probe_pruned(
        spark, ivf_path, cid, qvec, "vec_id", "embedding", exclude_id=PROBE_VEC_ID
    )
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert f"centroid_id = {cid}" in plan or "centroid_id" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_one_file_per_centroid_partition(spark, ivf_path):
    """write_partitioned repartitions on the partition column: one file per
    centroid directory, not tasks × partitions small files."""
    files = spark.read.option("basePath", ivf_path).parquet(ivf_path).inputFiles()
    assert len(files) == N_SEEDS
    dirs = {f.rsplit("/", 2)[-2] for f in files}
    assert dirs == {f"centroid_id={c}" for c in range(N_SEEDS)}


def test_pruned_probe_matches_inline_probe(spark, ivf_path):
    e, seeds, qvec, cid = _query_setup(spark)
    q = e.where(F.col("vec_id") == PROBE_VEC_ID)
    inline = [
        (r["vec_id"], r["cosine"])
        for r in ivf_probe_topk(e, seeds, q, "vec_id", "embedding", k=10).collect()
    ]
    pruned = [
        (r["vec_id"], r["cosine"])
        for r in ivf_probe_pruned(
            spark, ivf_path, cid, qvec, "vec_id", "embedding",
            exclude_id=PROBE_VEC_ID, k=10,
        ).collect()
    ]
    assert pruned == inline


def test_probe_never_opens_other_partitions(spark, ivf_path):
    """Behavioral proof of pruning (runs last — it destroys the index):
    corrupt every partition file except the probed centroid's. The pruned
    probe still answers (it never opens them); an unpruned scan chokes on
    the first corrupt footer."""
    import glob

    _, _, qvec, cid = _query_setup(spark)
    schema = spark.read.option("basePath", ivf_path).parquet(ivf_path).schema
    others = [
        f
        for f in glob.glob(f"{ivf_path}/centroid_id=*/part-*")
        if f"centroid_id={cid}/" not in f
    ]
    assert others
    for f in others:
        with open(f, "wb") as fh:
            fh.write(b"this is not a parquet file")

    got = ivf_probe_pruned(
        spark, ivf_path, cid, qvec, "vec_id", "embedding",
        exclude_id=PROBE_VEC_ID, k=10, schema=schema,
    ).collect()
    assert len(got) == 10

    with pytest.raises(Exception):
        spark.read.option("basePath", ivf_path).parquet(ivf_path).select(
            "vec_id"
        ).collect()


def test_kmeans_trained_centroids_drive_the_index(spark, tmp_path):
    """Close the ANN loop: fit the coarse quantizer with k-means (instead
    of arbitrary seed rows), materialize the index partitioned by the
    TRAINED centroid assignment, and probe with pruning — the production
    IVF build sequence."""
    from epiteam_network_etl_functions_spark.operators.similarity import (
        kmeans_fit,
    )

    prep(spark)
    e = catalog.load(spark, SF_DIR, "embeddings")
    dim = len(e.select("embedding").head()[0])
    cents = kmeans_fit(e, "vec_id", "embedding", dim, k=4, n_iter=2)
    seeds = spark.createDataFrame(
        [(cid, [float(x) for x in w]) for cid, w in cents],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "trained_index")
    ivf_materialize(e, seeds, path, "vec_id", "embedding")

    indexed = spark.read.parquet(path)
    assert indexed.count() == e.count()
    live = {r[0] for r in indexed.select("centroid_id").distinct().collect()}
    assert live <= {cid for cid, _ in cents} and len(live) >= 2

    # probe the cluster of vec 42 with pruning; must equal brute force
    # within that cluster
    qrow = (
        e.where(F.col("vec_id") == PROBE_VEC_ID)
        .select(as_double(F.col("embedding")).alias("v"))
        .head()
    )
    assignments = ivf_assign(e, seeds, "vec_id", "embedding")
    cid = (
        assignments.where(F.col("vec_id") == PROBE_VEC_ID)
        .select("centroid_id")
        .head()[0]
    )
    pruned = ivf_probe_pruned(
        spark, path, cid, qrow[0], "vec_id", "embedding",
        exclude_id=PROBE_VEC_ID, k=5,
    ).collect()
    from epiteam_network_etl_functions_spark.operators.similarity import (
        cosine_topk_lit,
    )

    cluster_ids = assignments.where(F.col("centroid_id") == cid).select("vec_id")
    brute = cosine_topk_lit(
        e.join(cluster_ids, "vec_id"), qrow[0], "vec_id", "embedding",
        exclude_id=PROBE_VEC_ID, k=5,
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in pruned] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]
