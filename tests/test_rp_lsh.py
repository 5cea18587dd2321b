"""Random-projection LSH: probe correctness, recall vs brute force,
plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark import catalog
from epiteam_network_etl_functions_spark.operators.similarity import (
    _hamming_probes,
    cosine_topk_lit,
    random_planes,
    rp_bucket_col,
    rp_lsh_topk,
)
from tests.conftest import PARITY_SF_DIR


def test_hamming_probes():
    assert _hamming_probes("000", 0) == ["000"]
    assert _hamming_probes("000", 1) == ["000", "001", "010", "100"]
    assert len(_hamming_probes("0000", 2)) == 1 + 4 + 6


def test_planes_deterministic():
    assert random_planes(8, 4, seed=1) == random_planes(8, 4, seed=1)
    assert random_planes(8, 4, seed=1) != random_planes(8, 4, seed=2)


@pytest.fixture(scope="module")
def emb(spark):
    return catalog.load(spark, PARITY_SF_DIR, "embeddings").cache()


def test_bucket_is_pure_projection(emb):
    planes = random_planes(64, 8)
    df = emb.select("vec_id", rp_bucket_col(F.col("embedding"), planes).alias("b"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    buckets = df.collect()
    assert all(len(r["b"]) == 8 and set(r["b"]) <= {"0", "1"} for r in buckets)
    # planes actually split the corpus (not all one bucket)
    assert len({r["b"] for r in buckets}) > 4


def test_probe_subset_and_recall(spark, emb):
    """LSH top-k results are a subset of the probed buckets' rows and
    recall@10 vs brute force is substantial at Hamming radius 1 (and
    grows with radius — checked monotonic)."""
    planes = random_planes(64, 8)
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]

    truth = {
        r["vec_id"]
        for r in cosine_topk_lit(
            emb, qvec, "vec_id", "embedding", exclude_id=0, k=10
        ).collect()
    }
    recalls = []
    for radius in (1, 2):
        got = {
            r["vec_id"]
            for r in rp_lsh_topk(
                emb, qvec, planes, "vec_id", "embedding",
                k=10, probe_radius=radius, exclude_id=0,
            ).collect()
        }
        assert len(got) <= 10
        recalls.append(len(got & truth) / len(truth))
    assert recalls[0] >= 0.3  # radius-1 probe finds a real fraction
    assert recalls[1] >= recalls[0]  # multi-probe monotone
