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


def test_common_neighbor_scores_star_and_path(spark):
    """Star K_{1,4}: every leaf pair shares exactly the hub (n_common=1,
    6 non-adjacent pairs); path P4 has (1,3),(2,4) via one center each
    and no score for the adjacent or distance-3 pairs."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        common_neighbor_scores,
    )

    star = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    got = {
        (r.a_id, r.b_id): r.n_common
        for r in common_neighbor_scores(star).collect()
    }
    assert got == {(a, b): 1 for a in (2, 3, 4) for b in (3, 4, 5) if a < b}

    p4 = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r.a_id, r.b_id): r.n_common
        for r in common_neighbor_scores(p4).collect()
    }
    assert got == {(1, 3): 1, (2, 4): 1}


def test_common_neighbor_scores_degree_cap(spark):
    """A generous cap reproduces the uncapped result exactly; a tight cap
    yields a SUBSET with scores bounded by the uncapped scores (dropping
    hub centers only removes evidence, never adds it). Hub-and-spoke plus
    a low-degree triangle chain exercises both regimes."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        common_neighbor_scores,
    )

    g = _edges(
        spark,
        [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (5, 6), (6, 7), (7, 8)],
    )
    full = {
        (r.a_id, r.b_id): r.n_common
        for r in common_neighbor_scores(g).collect()
    }
    loose = {
        (r.a_id, r.b_id): r.n_common
        for r in common_neighbor_scores(g, max_degree=100).collect()
    }
    assert loose == full
    tight = {
        (r.a_id, r.b_id): r.n_common
        for r in common_neighbor_scores(g, max_degree=2).collect()
    }
    # (6, 8) is a non-edge whose only common neighbor is node 7 (deg 2):
    # the tight cap must preserve it while dropping all hub-only evidence
    assert tight.get((6, 8)) == 1
    for pair, n in tight.items():
        assert pair in full and n <= full[pair]
    # node 1 (degree 5) was the only common neighbor of e.g. (4, 5):
    # that pair must disappear under the cap
    assert (4, 5) in full and (4, 5) not in tight


def test_adamic_adar_star_weights(spark):
    """Star K_{1,4}: every leaf pair's only common neighbor is the hub
    (degree 4), so aa_nano = round(1e9/ln(4)) exactly, and the pair set
    matches the unweighted kernel's."""
    import math

    from epiteam_network_etl_functions_spark.operators.graphstats import (
        adamic_adar_scores,
        common_neighbor_scores,
    )

    star = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    got = {
        (r.a_id, r.b_id): (r.n_common, r.aa_nano)
        for r in adamic_adar_scores(star).collect()
    }
    want_nano = round(1e9 / math.log(4))
    assert got == {
        (a, b): (1, want_nano)
        for a in (2, 3, 4)
        for b in (3, 4, 5)
        if a < b
    }
    cn = {
        (r.a_id, r.b_id) for r in common_neighbor_scores(star).collect()
    }
    assert set(got) == cn


def test_adamic_adar_discounts_hubs(spark):
    """Two non-adjacent pairs with one common neighbor each: the pair
    whose witness is the low-degree center must outscore the pair whose
    witness is the hub, even though n_common ties."""
    from epiteam_network_etl_functions_spark.operators.graphstats import (
        adamic_adar_scores,
    )

    # hub 1 (degree 5) witnesses (4, 5); quiet node 7 (degree 2)
    # witnesses (6, 8)
    g = _edges(
        spark,
        [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (5, 6), (6, 7), (7, 8)],
    )
    got = {
        (r.a_id, r.b_id): r
        for r in adamic_adar_scores(g).collect()
    }
    hub_pair, quiet_pair = got[(4, 5)], got[(6, 8)]
    assert hub_pair.n_common == quiet_pair.n_common == 1
    assert quiet_pair.aa_nano > hub_pair.aa_nano
