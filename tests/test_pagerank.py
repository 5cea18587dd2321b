"""pagerank vs numpy power iteration (same math, independent code)."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from epiteam_network_etl_functions_spark.plans.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "a_id long, b_id long"
    )


def _numpy_pagerank(pairs, n, damping=0.85, iters=100):
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[a, b] = adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    present = deg > 0
    idx = np.where(present)[0]
    m = len(idx)
    P = adj[np.ix_(idx, idx)] / deg[idx][:, None]
    r = np.full(m, 1.0 / m)
    for _ in range(iters):
        r = (1 - damping) / m + damping * (P.T @ r)
    return {int(idx[i]): float(r[i]) for i in range(m)}


def test_symmetric_graph_uniform(spark):
    """On a cycle every node is equivalent: uniform ranks, sum 1."""
    c5 = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)])
    ranks = {r["node_id"]: r["rank"] for r in pagerank(c5, tol=1e-10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    for v in ranks.values():
        assert abs(v - 0.2) < 1e-8


def test_star_center_dominates(spark):
    star = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    ranks = {r["node_id"]: r["rank"] for r in pagerank(star, tol=1e-10).collect()}
    assert ranks[0] > 2.5 * ranks[1]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("seed", [5])
def test_matches_numpy_power_iteration(spark, seed):
    rng = random.Random(seed)
    n = 25
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.15
    ]
    want = _numpy_pagerank(pairs, n)
    got = {
        r["node_id"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), tol=1e-9, max_iter=100).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_label_propagation_two_cliques(spark):
    """Two 5-cliques joined by one bridge edge: each clique converges to
    its own label; communities = 2."""
    from epiteam_network_etl_functions_spark.plans.pagerank import (
        label_propagation,
    )

    c1 = list(itertools.combinations(range(0, 5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    bridge = [(4, 10)]
    labels = {
        r["node_id"]: r["label"]
        for r in label_propagation(_edges(spark, c1 + c2 + bridge)).collect()
    }
    left = {labels[i] for i in range(0, 5)}
    right = {labels[i] for i in range(10, 15)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_label_propagation_deterministic(spark):
    from epiteam_network_etl_functions_spark.plans.pagerank import (
        label_propagation,
    )

    rng = random.Random(41)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(30), 2)
        if rng.random() < 0.15
    ]
    df = _edges(spark, pairs)
    a = {(r["node_id"], r["label"]) for r in label_propagation(df).collect()}
    b = {
        (r["node_id"], r["label"])
        for r in label_propagation(df.repartition(7)).collect()
    }
    assert a == b
