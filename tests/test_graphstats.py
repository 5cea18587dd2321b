"""degrees / triangle_count on known graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.operators.graphstats import (
    degrees,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "a_id long, b_id long"
    )


def test_degrees_triangle_on_k4(spark):
    """K4: every node degree 3, C(4,3)=4 triangles."""
    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    d = {r["node_id"]: r["degree"] for r in degrees(k4).collect()}
    assert d == {1: 3, 2: 3, 3: 3, 4: 3}
    assert triangle_count(k4).collect()[0]["n_triangles"] == 4


def test_triangle_free_graph(spark):
    """C4 (square) has zero triangles; star has zero."""
    c4 = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert triangle_count(c4).collect()[0]["n_triangles"] == 0
    star = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    assert triangle_count(star).collect()[0]["n_triangles"] == 0


def test_triangles_exactly_once(spark):
    """One triangle + pendant edges: counted once despite extra wedges."""
    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (2, 5)])
    assert triangle_count(g).collect()[0]["n_triangles"] == 1


def test_matches_random_reference(spark):
    """Erdos-Renyi-ish random graph vs a pure-python triangle counter."""
    import itertools
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    pairs = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2
    ]
    eset = set(pairs)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    got = triangle_count(_edges(spark, pairs)).collect()[0]["n_triangles"]
    assert got == want
    dsum = sum(
        r["degree"] for r in degrees(_edges(spark, pairs)).collect()
    )
    assert dsum == 2 * len(pairs)


def test_clustering_coefficients(spark):
    """Triangle with a pendant: triangle nodes cc depend on degree; the
    pendant node (degree 1) scores 0."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        clustering_coefficients,
    )

    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    cc = {r["node_id"]: r for r in clustering_coefficients(g).collect()}
    assert cc[1]["clustering"] == 1.0  # degree 2, 1 triangle / 1 possible
    assert cc[2]["clustering"] == 1.0
    assert cc[3]["degree"] == 3 and abs(cc[3]["clustering"] - 1 / 3) < 1e-6
    assert cc[4]["degree"] == 1 and cc[4]["clustering"] == 0.0


def test_node_triangles_match_networkx_free_reference(spark):
    """Random graph: per-node triangle counts vs pure-python counting."""
    import itertools
    import random

    from epiteam_network_etl_functions_spark.operators.graphstats import (
        node_triangles,
    )

    rng = random.Random(29)
    nodes = list(range(25))
    pairs = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.25
    ]
    eset = set(pairs)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    got = {
        r["node_id"]: r["n_triangles"]
        for r in node_triangles(_edges(spark, pairs)).collect()
    }
    assert got == want


def _peel(edges, k):
    from collections import defaultdict

    E = set(edges)
    while True:
        deg = defaultdict(int)
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            return E
        E = E2

def test_kcore_matches_bruteforce(spark):
    from epiteam_network_etl_functions_spark.operators.graphstats import kcore

    # triangle {1,2,3} + pendant chain 3-4-5: 2-core is exactly the triangle
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    core, rounds = kcore(df, 2)
    got = {(r["node_id"], r["degree"]) for r in core.collect()}
    expected_edges = _peel(edges, 2)
    from collections import defaultdict

    deg = defaultdict(int)
    for a, b in expected_edges:
        deg[a] += 1
        deg[b] += 1
    assert got == set(deg.items())
    assert rounds == 2  # 5 drops (deg 1), then 4 drops, then stable


def test_kcore_empty_when_k_exceeds_degrees(spark):
    from epiteam_network_etl_functions_spark.operators.graphstats import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], ["a_id", "b_id"])
    core, rounds = kcore(df, 3)
    assert core.count() == 0


def test_iterative_kernels_handle_empty_graphs(spark):
    """Empty edge lists must yield empty results, not crash — the guard
    paths (n==0 PageRank, zero-round peeling, empty label set)."""
    from epiteam_network_etl_functions_spark.operators.graphstats import kcore
    from epiteam_network_etl_functions_spark.plans.pagerank import (
        label_propagation,
        pagerank,
    )

    empty = spark.createDataFrame([], "a_id long, b_id long")
    assert pagerank(empty).count() == 0
    assert label_propagation(empty).count() == 0
    core, rounds = kcore(empty, k=2)
    assert core.count() == 0 and rounds == 0


def test_assortativity_star_is_minus_one(spark):
    """Star K_{1,3}: every edge joins the hub (deg 3) to a leaf (deg 1) —
    perfectly disassortative, r = -1 (networkx agrees)."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        degree_assortativity,
    )

    star = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    row = degree_assortativity(star).collect()[0]
    assert row["n_endpoints"] == 6
    assert row["assortativity"] == -1.0


def test_assortativity_path_p4(spark):
    """Path 1-2-3-4: exact moment sums give r = -0.5 (the
    networkx.degree_assortativity_coefficient value for P4)."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        degree_assortativity,
    )

    p4 = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    row = degree_assortativity(p4).collect()[0]
    assert row["n_endpoints"] == 6
    assert row["assortativity"] == -0.5
