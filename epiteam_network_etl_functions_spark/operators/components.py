"""Distributed connected components over an edge list.

The reference consumes `connected_component` arrays for neighbour-frequency
imputation (home_ageb_imputers.py:120-206) but builds them with networkx on
one machine. This kernel computes them on the cluster: iterative min-label
propagation (each node adopts the smallest id reachable in one hop;
converges in O(diameter) rounds; the large-star/small-star optimization is
the known upgrade for pathological diameters).

Each round is one join + one aggregation on the edge list — no driver-side
graph. Convergence is checked with a cheap changed-count aggregate; state
is cached and the previous round unpersisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected_adjacency(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Canonical (src, dst) adjacency with both directions, deduplicated —
    shared by components and the distributed SEIR."""
    fwd = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.unionByName(rev).distinct()


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 50,
) -> DataFrame:
    """(node_id, component_id) with component_id = min node id in the
    component. Nodes appearing only in `edges`; isolated nodes absent from
    the edge list keep themselves as their own component by definition —
    union them in from the node table if needed.

    Min-label propagation converges in O(diameter) rounds; if the cap is
    hit first the labels would be silently wrong, so that raises instead —
    raise ``max_iterations`` (or switch to large-star/small-star, the known
    O(log n)-round variant) for extreme-diameter graphs."""
    adj = undirected_adjacency(edges, a_col, b_col).cache()

    labels = (
        adj.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component_id", F.col("node_id"))
        .cache()
    )
    converged = False
    for _ in range(max_iterations):
        # each node: min(own label, min neighbour label)
        neighbour_min = (
            adj.join(
                labels.withColumnRenamed("node_id", "dst").withColumnRenamed(
                    "component_id", "__nl"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("__nl").alias("__min_nl"))
            .withColumnRenamed("src", "node_id")
        )
        new_labels = (
            labels.join(neighbour_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("__min_nl"), F.col("component_id")),
                ).alias("component_id"),
            )
            .cache()
        )
        changed = (
            labels.withColumnRenamed("component_id", "__old")
            .join(new_labels, "node_id")
            .where(F.col("__old") != F.col("component_id"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    adj.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(graph diameter exceeds the cap); raise max_iterations"
        )
    return labels


def components_as_arrays(
    labels: DataFrame, id_col: str = "node_id", comp_col: str = "component_id"
) -> DataFrame:
    """The reference's `connected_component` array form (sorted member
    lists), feeding plans/mobility.impute_neighbour_frequency. Only for
    components that fit in a row — bounded by construction in the
    co-location graph; keep the (node, component) long form at scale."""
    return (
        labels.groupBy(comp_col)
        .agg(F.array_sort(F.collect_list(id_col)).alias("connected_component"))
        .drop(comp_col)
    )
