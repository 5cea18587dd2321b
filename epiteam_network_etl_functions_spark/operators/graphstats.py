"""Graph statistics over edge-list DataFrames — analytics the reference
computes with networkx on collected graphs (degree/size logging around
MakeEmpiricNetworks.py:108-126, NetworkBuilder.py:447), re-expressed as
distributed relational plans so they run on the full 100 TB co-location
network, not a driver copy.

Edge-list convention: undirected simple graph as canonical rows
(a < b, no duplicates) — exactly what colocation_edges emits.

- `degrees`: one union + one groupBy (count both endpoint roles).
- `triangle_count`: the ordered wedge join — with edges oriented a < b,
  join (a,b)×(b,c) to form wedges then semi-join the closing edge (a,c).
  Ordering means each triangle is counted exactly once, and the wedge
  join's skew is bounded by forward-degree (max O(sqrt(m)) edges from
  any node under orientation) — the standard m^{3/2} algorithm, two
  shuffles, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """(node_id, degree) for an undirected canonical edge list."""
    ends = edges.select(F.col(a_col).alias("node_id")).unionAll(
        edges.select(F.col(b_col).alias("node_id"))
    )
    return ends.groupBy("node_id").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """1-row frame (n_triangles) counting unique triangles.

    Requires canonical orientation (a < b). Wedges (a<b<c) come from
    joining edge (a,b) with edge (b,c); a left-semi join against the
    edge set on (a,c) keeps closed wedges only — each triangle
    {x<y<z} is produced exactly once, as wedge (x,y)+(y,z) closed by
    (x,z)."""
    e1 = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e2 = edges.select(F.col(a_col).alias("b"), F.col(b_col).alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("c"))
    closed = wedges.join(closing, ["a", "c"], "left_semi")
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))
