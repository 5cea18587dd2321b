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


def node_triangles(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """(node_id, n_triangles): per-node triangle membership. Each closed
    wedge (a<b<c) contributes one triangle to each of its three nodes —
    materialize the closed wedges once, explode the three roles, count."""
    e1 = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e2 = edges.select(F.col(a_col).alias("b"), F.col(b_col).alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("c"))
    closed = wedges.join(closing, ["a", "c"], "left_semi")
    members = closed.selectExpr("explode(array(a, b, c)) AS node_id")
    return members.groupBy("node_id").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficients(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id", digits: int = 6
) -> DataFrame:
    """(node_id, degree, n_triangles, clustering): local clustering
    coefficient triangles / C(degree, 2); degree-1 nodes score 0.0.
    Degrees and triangle memberships are two aggregations joined on the
    node — both output-sized."""
    d = degrees(edges, a_col, b_col)
    t = node_triangles(edges, a_col, b_col)
    joined = d.join(t, "node_id", "left").select(
        "node_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )
    possible = (F.col("degree") * (F.col("degree") - 1) / 2.0)
    cc = F.when(
        F.col("degree") >= 2,
        F.round(F.col("n_triangles") / possible, digits),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("clustering", cc)


def kcore(
    edges: DataFrame,
    k: int,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """k-core decomposition by iterative peeling: repeatedly delete nodes
    with degree < k (and their edges) until a fixpoint. Returns
    ``(core_degrees, rounds)`` where core_degrees is (node_id, core_degree)
    for the surviving subgraph.

    Each round is two semi-joins + one aggregation over the shrinking edge
    list; lineage is truncated per round with localCheckpoint (the
    components-kernel idiom) so the plan doesn't grow with iterations.
    Convergence is detected by edge count, which strictly decreases until
    the fixpoint — on a 100 TB edge list every round is shuffle-bounded by
    the surviving edges, and the round count is bounded by the graph's
    degeneracy ordering depth (small for real co-location graphs; the
    returned ``rounds`` lets callers assert it).

    Raises ``RuntimeError`` if ``max_iter`` rounds elapse without reaching
    the fixpoint — a partially peeled subgraph is NOT a k-core and silently
    returning it would poison downstream joins."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    rounds = 0
    converged = False
    for _ in range(max_iter):
        deg = degrees(e, "a", "b").where(F.col("degree") >= k)
        keep = deg.select("node_id")
        e2 = (
            e.join(keep.withColumnRenamed("node_id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node_id", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n2 = e2.count()
        e = e2
        if n2 == n_edges:
            converged = True
            break
        n_edges = n2
        rounds += 1
    if not converged:
        raise RuntimeError(
            f"kcore(k={k}) did not converge within max_iter={max_iter} "
            f"rounds ({n_edges} edges still shrinking); raise max_iter"
        )
    return degrees(e, "a", "b"), rounds


def common_neighbor_scores(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_degree: int | None = None,
) -> DataFrame:
    """(a_id, b_id, n_common) for NON-adjacent pairs with at least one
    common neighbor — the link-prediction/common-neighbors kernel.

    Plan: symmetrize the canonical edge list, self-join on the wedge
    CENTER node, aggregate per endpoint pair, then left_anti against the
    edge list to keep non-edges only. Wedge volume is sum(deg(center)^2),
    i.e. DEGREE-QUADRATIC: on a graph whose density (not node count)
    grows, this term explodes — measured at the 10x density tier, wedges
    grow ~100x for 10x degree and exhaust local spill. ``max_degree``
    is the standard mitigation: drop wedge CENTERS above the cap
    (super-hub neighbors carry near-zero link-prediction evidence —
    the Adamic-Adar 1/log(deg) weight formalizes the same intuition),
    bounding wedges at n*cap^2. Scores become lower bounds; pairs whose
    only common neighbors are hubs drop out. At fixed degree (the
    realistic growth direction for contact graphs: more devices, not
    denser cells) the uncapped plan is linear in nodes."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    if max_degree is not None:
        ok = (
            degrees(e, "a", "b")
            .where(F.col("degree") <= max_degree)
            .select(F.col("node_id").alias("u"))
        )
        adj = adj.join(ok, "u", "left_semi")
    x, y = adj.alias("x"), adj.alias("y")
    wedges = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")))
        .groupBy(F.col("x.v").alias("a_id"), F.col("y.v").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    existing = e.select(F.col("a").alias("a_id"), F.col("b").alias("b_id"))
    return wedges.join(existing, ["a_id", "b_id"], "left_anti")


def adamic_adar_scores(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_degree: int | None = None,
) -> DataFrame:
    """(a_id, b_id, n_common, aa_nano) for non-adjacent pairs: the
    Adamic-Adar link-prediction score — each common neighbor contributes
    1/ln(degree), so hub co-membership is discounted smoothly (the soft
    form of the ``max_degree`` hard cap, which still applies for the
    degree-quadratic wedge bound).

    Determinism: the per-wedge weight quantizes to integer nanos
    IMMEDIATELY after the ln (transcendental-then-quantize,
    DETERMINISM.md), so the per-pair sum is exact integer arithmetic and
    aggregation order cannot perturb scores or the top-k cut. A center
    spanning a pair has degree >= 2, so ln(deg) >= ln 2 and the weight
    is finite and positive. Callers derive the float score as
    aa_nano / 1e9 and MUST order/cut on aa_nano, not the float."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = degrees(e, "a", "b").select(
        F.col("node_id").alias("u"), "degree"
    )
    if max_degree is not None:
        deg = deg.where(F.col("degree") <= max_degree)
    adj = adj.join(deg, "u")
    w_nano = F.round(F.lit(1e9) / F.log(F.col("x.degree"))).cast("long")
    x, y = adj.alias("x"), adj.alias("y")
    wedges = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")))
        .groupBy(F.col("x.v").alias("a_id"), F.col("y.v").alias("b_id"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(w_nano).alias("aa_nano"),
        )
    )
    existing = e.select(F.col("a").alias("a_id"), F.col("b").alias("b_id"))
    return wedges.join(existing, ["a_id", "b_id"], "left_anti")


def degree_assortativity(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """1-row frame (n_endpoints, assortativity): Newman's degree
    assortativity r over an undirected canonical edge list — the Pearson
    correlation of endpoint degrees taken over the directed double cover
    (each edge contributes (dx,dy) and (dy,dx), matching
    networkx.degree_assortativity_coefficient).

    Cross-engine/cross-run determinism: r is assembled from the exact
    integer moment sums with a single double division — never from
    corr()'s order-dependent streaming accumulation. The double cover is
    never materialized: over the SINGLE orientation (m rows) the cover's
    moments are n = 2m, S_x = S_y = sum(dx+dy), S_xy = 2*sum(dx*dy),
    S_xx = S_yy = sum(dx^2+dy^2), so one pass suffices and the x/y
    denominators coincide. The edge list feeds three consumers (both
    endpoint roles of the degree count + the pair join), so it is
    materialized once with localCheckpoint (the kcore idiom) rather than
    re-evaluating a possibly-expensive upstream subtree per consumer.
    Plan: degree aggregate + two node-keyed joins back to the edges,
    then one scalar aggregate; every stage combines map-side.

    Overflow: the SUMS fit int64 far past bench scale, but the final
    expression multiplies sums by sums (s1*s1 ~ (2m*avg_deg)^2 passes
    int64's 9.2e18 already at ~2e7 edges — measured at the 10x tier:
    s1^2 = 1.4e22, where silent int64 wrap would flip r's sign while
    the DuckDB oracle computes exactly in HUGEINT). The products are
    therefore formed in DECIMAL(38,0): exact up to ~1e38, i.e. any
    graph with sum(deg^2) < 1e19 — beyond any realizable edge list —
    and the decimal->double conversion at the end rounds identically
    to DuckDB's hugeint->double."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e = e.localCheckpoint(eager=True)
    deg = degrees(e, "a", "b")
    da = deg.select(F.col("node_id").alias("a"), F.col("degree").alias("dx"))
    db = deg.select(F.col("node_id").alias("b"), F.col("degree").alias("dy"))
    joined = e.join(da, "a").join(db, "b")
    dec = "decimal(38,0)"
    m = F.count(F.lit(1))
    n = (m * 2).cast(dec)
    # per-row terms fit int64 trivially (degrees are device counts); the
    # ACCUMULATORS are decimal so even the sums can pass int64 safely
    s1 = F.sum((F.col("dx") + F.col("dy")).cast(dec))
    sp = F.sum((F.col("dx") * F.col("dy")).cast(dec))
    s2 = F.sum(
        (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).cast(dec)
    )
    return joined.agg(
        (m * 2).cast("bigint").alias("n_endpoints"),
        F.round(
            (n * (sp * 2) - s1 * s1).cast("double")
            / (n * s2 - s1 * s1).cast("double"),
            6,
        ).alias("assortativity"),
    )
