"""Distributed SEIR invariants (conservation, monotonicity, determinism,
full sweep on a connected graph with certain transitions)."""

from __future__ import annotations

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.plans.seir_distributed import distributed_seir


def _ring(spark, n):
    nodes = spark.createDataFrame([Row(node_id=i) for i in range(n)])
    edges = spark.createDataFrame(
        [Row(a_node=i, b_node=(i + 1) % n) for i in range(n)]
    )
    return nodes, edges


def test_conservation_and_monotone_r(spark):
    nodes, edges = _ring(spark, 40)
    traj = distributed_seir(
        spark, nodes, edges, beta=0.6, sigma=0.6, gamma=0.3, seed=3, t_max=60
    ).collect()
    r_prev = 0
    for row in traj:
        assert row["S"] + row["E"] + row["I"] + row["R"] == 40
        assert row["R"] >= r_prev
        r_prev = row["R"]
    assert traj[0]["I"] == 1 and traj[0]["S"] == 39


def test_deterministic_under_seed(spark):
    nodes, edges = _ring(spark, 25)
    a = distributed_seir(spark, nodes, edges, seed=9, t_max=30, beta=0.5, sigma=0.5, gamma=0.2).collect()
    b = distributed_seir(spark, nodes, edges, seed=9, t_max=30, beta=0.5, sigma=0.5, gamma=0.2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = distributed_seir(spark, nodes, edges, seed=10, t_max=30, beta=0.5, sigma=0.5, gamma=0.2).collect()
    assert [tuple(r) for r in a] != [tuple(r) for r in c]


def test_certain_epidemic_sweeps_ring(spark):
    """beta=sigma=gamma=1: the wave advances deterministically and every
    node ends Recovered."""
    nodes, edges = _ring(spark, 12)
    traj = distributed_seir(
        spark, nodes, edges, beta=1.0, sigma=1.0, gamma=1.0, seed=0, t_max=40
    ).collect()
    final = traj[-1]
    assert final["S"] == 0 and final["E"] == 0 and final["I"] == 0
    assert final["R"] == 12
