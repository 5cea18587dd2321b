"""Distributed discrete-time SEIR over DataFrames (SURVEY.md §7 step 11
stretch: the reference's Gillespie runs are driver-side per graph; this
variant distributes ONE simulation over a cluster-sized graph).

State is a node table (node_id, state); each time step is:
    exposure:   edges ⋈ infected -> a susceptible node with k infected
                neighbours becomes exposed with prob 1-(1-β)^k
                (per-contact transmission, matching the per-edge dynamics)
    progression: E -> I with prob σ, I -> R with prob γ
Randomness is hash-uniform — u(node, t, salt) = md5-derived in [0,1) — so a
run is exactly reproducible for a (graph, seed) pair regardless of
partitioning or retries (rand(seed) would not be: it depends on partition
layout). Event times are step-quantized; that is the documented divergence
from the reference's continuous-time EoN runs.

Scale shape per step: one join edge-list ⋈ infected (key-partitioned),
one union, one aggregation for the trajectory row. State is cached and the
previous step unpersisted; lineage is cut every few steps via
localCheckpoint so plans do not grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

S, E, I, R = "S", "E", "I", "R"


def _uniform(col_id, t: int, salt: str, seed: int):
    """Deterministic hash-uniform in [0,1): the sampling kernel's 48-bit
    md5 bucket (one shared derivation — operators/sampling.hash_bucket)."""
    from ..operators.sampling import hash_bucket

    return hash_bucket(col_id, 1 << 48, salt=f"{seed}:{salt}:{t}").cast(
        "double"
    ) / float(1 << 48)


def distributed_seir(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    beta: float = 0.1,
    sigma: float = 0.2,
    gamma: float = 0.1,
    seed: int = 0,
    t_max: int = 50,
    initial_infected: int = 1,
    id_col: str = "node_id",
    a_col: str = "a_node",
    b_col: str = "b_node",
) -> DataFrame:
    """Run one SEIR epidemic; returns the trajectory (t, S, E, I, R).

    Initial infections: the `initial_infected` smallest node ids
    (deterministic; pass a pre-seeded state column for custom seeding).
    """
    from ..operators.components import undirected_adjacency

    # Cut lineage at entry: each step references the previous state's plan
    # TWICE (join left + infected side), so logical plans double between
    # checkpoints — starting from a LogicalRDD keeps that growth on a tiny
    # base instead of the caller's full pipeline lineage (a contact-matrix
    # caller otherwise OOMs the driver on plan trees alone).
    adj = undirected_adjacency(edges, a_col, b_col).localCheckpoint()

    first = [r[0] for r in nodes.select(id_col).orderBy(id_col).limit(initial_infected).collect()]
    state = nodes.select(
        F.col(id_col),
        F.when(F.col(id_col).isin(first), I).otherwise(S).alias("state"),
    ).localCheckpoint()

    rows = []
    for t in range(t_max + 1):
        counts = {
            r["state"]: r["n"]
            for r in state.groupBy("state").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        rows.append((t, counts.get(S, 0), counts.get(E, 0), counts.get(I, 0), counts.get(R, 0)))
        if counts.get(E, 0) == 0 and counts.get(I, 0) == 0:
            break
        if t == t_max:
            break  # last trajectory row recorded; don't build a discarded step

        infected = state.where(F.col("state") == I).select(F.col(id_col).alias("src"))
        # k = number of infected contacts -> per-contact transmission
        exposure_counts = (
            adj.join(infected, "src")
            .groupBy("dst")
            .agg(F.count(F.lit(1)).alias("__k"))
            .withColumnRenamed("dst", id_col)
        )
        p_expose = 1.0 - F.pow(F.lit(1.0 - beta), F.col("__k"))
        new_state = (
            state.join(exposure_counts, id_col, "left")
            .select(
                id_col,
                F.when(
                    (F.col("state") == S)
                    & F.col("__k").isNotNull()
                    & (_uniform(F.col(id_col), t, "expose", seed) < p_expose),
                    E,
                )
                .when(
                    (F.col("state") == E)
                    & (_uniform(F.col(id_col), t, "progress", seed) < sigma),
                    I,
                )
                .when(
                    (F.col("state") == I)
                    & (_uniform(F.col(id_col), t, "recover", seed) < gamma),
                    R,
                )
                .otherwise(F.col("state"))
                .alias("state"),
            )
        )
        # Eager localCheckpoint EVERY step: the state is materialized each
        # step anyway (the counts aggregate), checkpointing roots each
        # step's lineage in its own blocks — so dropping the predecessor
        # can never invalidate a recompute path, and plans stay O(1).
        # Fault-tolerance note for clusters: localCheckpoint blocks are
        # non-replicated; swap for reliable checkpoint() with a checkpoint
        # dir when executor loss must be survivable.
        new_state = new_state.localCheckpoint()
        state.unpersist()
        state = new_state
    adj.unpersist()
    state.unpersist()
    return spark.createDataFrame(rows, ["t", "S", "E", "I", "R"])
