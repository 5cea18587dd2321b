"""SEIR epidemic simulation + post-processing (reference seir_utils.py,
SimulationManager.py, csv_infected.py).

The reference runs EoN.Gillespie_simple_contagion per graph in an mp.Pool
(seir_utils.py:75-82). Continuous-time Gillespie is inherently sequential
per graph, so the Spark shape is the same as the reference's: fan the
*simulations* out (one task per (graph, seed)) and keep each run driver-style
inside its task. Here:

- `seir_discrete` is a deterministic-under-seed discrete-time SEIR over an
  edge list (numpy; documented divergence from Gillespie — event times are
  step-quantized).
- `run_seir_sweep` fans (seed -> trajectory) out via the JVM scheduler
  (parallelize over seeds), the reference's mp.Pool(10) (SimulationManager
  .py:371) without the process plumbing.
- `infected_by_block` / `trajectory_stats` are the csv_infected.py:88-121
  aggregations as DataFrame ops.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def seir_discrete(
    n_nodes: int,
    edges: list[tuple[int, int]],
    beta: float = 0.1,
    sigma: float = 0.2,
    gamma: float = 0.1,
    seed: int = 0,
    t_max: int = 100,
    initial_infected: int = 1,
) -> list[tuple[int, int, int, int, int]]:
    """Discrete-time SEIR on an undirected edge list; returns rows
    (t, S, E, I, R). Node-level states use the reference's state set
    (seir_utils.py:64-70); transmission/transition draws are seeded."""
    rng = np.random.default_rng(seed)
    # 0=S 1=E 2=I 3=R
    state = np.zeros(n_nodes, dtype=np.int8)
    first = rng.choice(n_nodes, size=min(initial_infected, n_nodes), replace=False)
    state[first] = 2
    adj: list[list[int]] = [[] for _ in range(n_nodes)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    out = []
    for t in range(t_max + 1):
        counts = np.bincount(state, minlength=4)
        out.append((t, int(counts[0]), int(counts[1]), int(counts[2]), int(counts[3])))
        if counts[1] == 0 and counts[2] == 0:
            break
        infected = np.flatnonzero(state == 2)
        exposures = set()
        for i in infected:
            for nb in adj[i]:
                if state[nb] == 0 and rng.random() < beta:
                    exposures.add(nb)
        e_to_i = np.flatnonzero(state == 1)[
            rng.random(int((state == 1).sum())) < sigma
        ]
        i_to_r = infected[rng.random(len(infected)) < gamma]
        for nb in exposures:
            state[nb] = 1
        state[e_to_i] = 2
        state[i_to_r] = 3
    return out


def run_seir_sweep(
    spark: SparkSession,
    n_nodes: int,
    edges: list[tuple[int, int]],
    seeds: list[int],
    **params,
) -> DataFrame:
    """Fan one SEIR run per seed across the cluster (the reference's
    mp.Pool seed sweep, seeds 0-99). Edges ship once via broadcast."""
    sc = spark.sparkContext
    edges_bc = sc.broadcast(edges)

    def run(seed: int):
        rows = seir_discrete(n_nodes, edges_bc.value, seed=seed, **params)
        return [(seed, *r) for r in rows]

    rdd = sc.parallelize(seeds, len(seeds)).flatMap(run)
    return spark.createDataFrame(rdd, ["seed", "t", "S", "E", "I", "R"])


def trajectory_stats(trajectories: DataFrame) -> DataFrame:
    """Mean/stddev of the infected curve across seeds per t
    (csv_infected.py:110-119 AVG/STDDEV by time)."""
    return (
        trajectories.groupBy("t")
        .agg(
            F.round(F.avg("I"), 6).alias("avg_I"),
            F.round(F.coalesce(F.stddev_samp("I"), F.lit(0.0)), 6).alias("std_I"),
            F.count(F.lit(1)).alias("n_runs"),
        )
    )


def infected_by_block(node_status: DataFrame) -> DataFrame:
    """Reference post-processing (csv_infected.py:88-121): per block, count
    nodes with an infection event (HAVING I NOT NULL -> where + agg)."""
    return (
        node_status.where(F.col("I").isNotNull())
        .groupBy("ageb_id")
        .agg(
            F.count(F.lit(1)).alias("n_infected"),
            F.round(F.avg("I"), 6).alias("avg_t_infected"),
        )
    )
