"""Unit locks for the text kernels that parity alone under-constrains:
argmax tie-break order (language ID) and TF-IDF rank determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.operators.text import (
    language_id_scores,
    occurrences,
    tfidf_top_terms,
)


def test_occurrences_non_overlapping(spark):
    df = spark.createDataFrame([("aaaa",), ("xyx",), ("",)], ["t"])
    got = [
        r[0]
        for r in df.select(occurrences(F.col("t"), "aa")).collect()
    ]
    # 'aaaa' -> 2 non-overlapping 'aa'; others 0
    assert got == [2, 0, 0]


def test_language_id_tie_breaks_in_declaration_order(spark):
    profiles = {"en": ("zz",), "es": ("zz",), "fr": ("qq",)}
    df = spark.createDataFrame([(1, "zz qq")], ["id", "text"])
    row = language_id_scores(df, "id", "text", profiles).collect()[0]
    # en and es tie at 1; declaration order means en wins
    assert row["s_en"] == row["s_es"] == 1
    assert row["pred_lang"] == "en"


def test_language_id_argmax(spark):
    profiles = {"en": ("aa",), "es": ("bb",)}
    df = spark.createDataFrame([(1, "bb bb aa")], ["id", "text"])
    row = language_id_scores(df, "id", "text", profiles).collect()[0]
    assert row["pred_lang"] == "es"


def test_tfidf_scores_and_ranks(spark):
    # doc1: 'a a b' ; doc2: 'b c'.  N=2.
    # df: a->1, b->2, c->1.
    df = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["doc_id", "text"])
    out = tfidf_top_terms(df, "doc_id", "text", n_docs=2, k=3).collect()
    by_key = {(r["doc_id"], r["term"]): r for r in out}

    def expected(tf, dfd, n=2):
        return round(tf * (math.log((n + 1) / (dfd + 1)) + 1), 6)

    assert by_key[(1, "a")]["score"] == expected(2, 1)
    assert by_key[(1, "b")]["score"] == expected(1, 2)
    assert by_key[(2, "c")]["score"] == expected(1, 1)
    # within doc 1, 'a' (tf=2, rare) outranks 'b' (tf=1, common)
    assert by_key[(1, "a")]["rnk"] == 1
    assert by_key[(1, "b")]["rnk"] == 2
    # equal rounded scores tie-break on the term: doc2 'b' vs 'c' differ, c rarer
    assert by_key[(2, "c")]["rnk"] == 1
    assert by_key[(2, "b")]["rnk"] == 2


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from epiteam_network_etl_functions_spark.operators.similarity import (
        gram_matrix,
    )

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    out = gram_matrix(df, "embedding", 5)
    got = {(r["i"], r["j"]): (r["n_vecs"], r["m_ij"]) for r in out.collect()}
    expected = mat.astype(np.float64).T @ mat.astype(np.float64) / len(mat)
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), (n, m) in got.items():
        assert n == 40 and i <= j
        assert abs(m - round(expected[i - 1, j - 1], 6)) < 2e-6


def test_pca_matches_numpy(spark):
    import numpy as np

    from epiteam_network_etl_functions_spark.operators.similarity import (
        pca_components,
        pca_project,
    )

    rng = np.random.default_rng(11)
    # anisotropic cloud so the spectrum is distinct
    base = rng.normal(size=(60, 4)) * np.array([5.0, 2.0, 0.5, 0.1])
    mat = (base @ np.linalg.qr(rng.normal(size=(4, 4)))[0]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    ).repartition(3)

    comps, vals, mu, n = pca_components(df, "embedding", 4, k=2)
    x = mat.astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    assert n == 60
    assert np.allclose(vals, evals[order], atol=1e-6)
    for got, exp in zip(comps, evecs[:, order].T):
        if exp[np.argmax(np.abs(exp))] < 0:
            exp = -exp
        assert np.allclose(got, exp, atol=1e-5)

    proj = pca_project(df, "vec_id", "embedding", 4, k=2)
    got = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in proj.collect()}
    centered = x - x.mean(axis=0)
    expected = centered @ comps.T
    for i in range(60):
        assert abs(got[i][0] - expected[i, 0]) < 1e-4
        assert abs(got[i][1] - expected[i, 1]) < 1e-4


def test_kmeans_matches_pure_python_lloyd(spark):
    import hashlib

    from epiteam_network_etl_functions_spark.operators.similarity import (
        kmeans_fit,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    # three well-separated blobs in 3-D
    mat = np.concatenate(
        [rng.normal(c, 0.1, size=(20, 3)) for c in (0.0, 5.0, 10.0)]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    ).repartition(3)

    got = kmeans_fit(df, "vec_id", "embedding", 3, k=3, n_iter=3)

    # pure-python replay of the exact-grid recipe
    x = {i: [round(float(v), 3) for v in row] for i, row in enumerate(mat)}
    order = sorted(x, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {c + 1: x[order[c]] for c in range(3)}
    for _ in range(3):
        members = {}
        for i, v in x.items():
            best = min(
                (round(sum((a - b) ** 2 for a, b in zip(v, w)), 6), c)
                for c, w in cents.items()
            )[1]
            members.setdefault(best, []).append(v)
        cents = {
            c: [round(sum(col) / len(col), 6) for col in zip(*vs)]
            for c, vs in sorted(members.items())
        }
    assert dict(got) == cents
    # sanity: the three blobs were actually separated
    means = sorted(w[0] for w in cents.values())
    assert means[0] < 1 and 4 < means[1] < 6 and means[2] > 9
