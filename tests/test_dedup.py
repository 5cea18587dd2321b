"""Dedup kernel regressions (beyond the driver's oracle coverage)."""

from __future__ import annotations

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.operators.dedup import jaccard_verify


def test_jaccard_verify_ignores_duplicate_shingle_rows(spark):
    # doc 1 and doc 2 share {x, y} out of union {x, y, z} => J = 2/3.
    # doc 1's "x" appears 3 times: a collect_list would inflate |A| to 5
    # and deflate J to 2/(5+2-2)=0.4 — the set semantics must hold.
    shingled = spark.createDataFrame(
        [Row(doc_id=1, shingle=s) for s in ["x", "x", "x", "y", "z"]]
        + [Row(doc_id=2, shingle=s) for s in ["x", "y"]]
    )
    cands = spark.createDataFrame([Row(a_id=1, b_id=2)])
    out = jaccard_verify(cands, shingled, "doc_id", threshold=0.0).collect()
    assert len(out) == 1
    assert abs(out[0]["jaccard"] - 2 / 3) < 1e-6


def test_prefix_filter_has_zero_false_negatives(spark):
    """Every pair with true Jaccard >= t must appear in the prefix-filter
    candidates (the PPJoin guarantee), checked against brute-force
    all-pairs on a small corpus."""
    from itertools import combinations

    from epiteam_network_etl_functions_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    docs = {
        1: "a b c d e",
        2: "a b c d x",
        3: "a b c y z",
        4: "p q r s t",
        5: "p q r s a",
        6: "m n o u v",
    }
    sets = {
        i: {
            "_".join(t.split()[j : j + 3])
            for j in range(len(t.split()) - 2)
        }
        for i, t in docs.items()
    }
    t = 0.3
    truth = {
        (a, b)
        for a, b in combinations(sorted(docs), 2)
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= t
    }
    rows = [(i, s) for i, ss in sets.items() for s in ss]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    cands = {
        (r["a_id"], r["b_id"])
        for r in prefix_filter_candidates(df, "doc_id", threshold=t).collect()
    }
    assert truth, "degenerate fixture"
    assert truth <= cands, f"missed true pairs: {truth - cands}"


def test_prefix_filter_shuffled_join_fallback_matches_broadcast(spark):
    """Beyond broadcast_vocab_max the rarity ranking must drop the FORCED
    broadcast hint (a 100 TB vocabulary breaks broadcast; AQE may still
    choose broadcast on its own when the side is genuinely small) — and
    the candidate set must be identical on both paths."""
    from epiteam_network_etl_functions_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    rows = [
        (i, f"s{j}")
        for i in range(1, 7)
        for j in range(i, i + 4)  # overlapping shingle windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")

    bcast = prefix_filter_candidates(df, "doc_id", threshold=0.3)
    shuf = prefix_filter_candidates(
        df, "doc_id", threshold=0.3, broadcast_vocab_max=0
    )
    assert sorted(map(tuple, bcast.collect())) == sorted(
        map(tuple, shuf.collect())
    )
    assert "ResolvedHint" in bcast._jdf.queryExecution().analyzed().toString()
    assert (
        "ResolvedHint"
        not in shuf._jdf.queryExecution().analyzed().toString()
    )


def test_prefix_filter_empty_corpus(spark):
    from epiteam_network_etl_functions_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    empty = spark.createDataFrame([], "doc_id long, shingle string")
    assert prefix_filter_candidates(empty, "doc_id").count() == 0
