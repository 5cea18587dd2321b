"""Similarity-search workload over the `embeddings` table (64-dim float
vectors, 10 labels)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import catalog
from ..operators.similarity import (
    as_double,
    cosine_topk,
    cosine_topk_lit,
    ivf_assign,
    ivf_probe_topk,
    l2_norm,
)
from ..session import prep
from . import query

K = 10
QUERY_VEC_ID = 0
N_SEEDS = 8  # IVF coarse centroids = vectors with vec_id 0..7

# DuckDB helpers: 1-based positional list access; all math in double.
_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM = f"sqrt({_DOT})"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return catalog.load(spark, sf_dir, "embeddings")


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({_NORM.format(a='embedding', b='embedding')}, 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dimension + L2 norm — the array-fold kernel (F.aggregate /
    zip_with), zero shuffles."""
    e = _emb(spark, sf_dir)
    v = as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(l2_norm(v), 6).alias("l2_norm"),
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label, CAST(u.pos AS BIGINT) AS pos,
           round(avg(u.val), 6) + 0.0 AS centroid
    FROM (
        SELECT label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> struct_pack(pos := i,
                                       val := CAST(embedding[i] AS DOUBLE)))) AS u
        FROM embeddings
    )
    GROUP BY label, u.pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector in long form (posexplode -> groupBy avg): the
    distributed centroid computation underlying k-means / IVF training.
    Measured against the folded one-wide-agg form
    (:func:`label_centroids_wide`): explode wins at bench scale (0.158 s
    vs 0.343 s at sf0.1 — per-execution re-optimization of a 64-agg plan
    dominates a 2k-row corpus); both shuffle only n_labels-sized partials
    because groupBy(label, pos) combines map-side, so the wide form's edge
    is per-row CPU that only matters from ~10⁷ rows up (SCALING.md)."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode(as_double(F.col("embedding"))))
        .select("label", (F.col("pos") + 1).cast("bigint").alias("pos"), "col")
        .groupBy("label", "pos")
        .agg((F.round(F.avg("col"), 6) + F.lit(0.0)).alias("centroid"))
    )


def label_centroids_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded variant: 64 per-position avg aggregates in ONE wide
    aggregation (no 64× row explosion), unpivoted after. Same result and
    rounding as :func:`label_centroids`; the at-scale shape when per-row
    hash-agg probes dominate (each exploded row is a separate (label, pos)
    probe; here each input row feeds 64 accumulators of one group row)."""
    e = _emb(spark, sf_dir)
    dim_row = e.select(F.size("embedding")).head()  # plan-build time, tiny job
    if dim_row is None:
        raise ValueError(f"embeddings table at {sf_dir} is empty")
    dim = dim_row[0]
    wide = e.groupBy("label").agg(
        *[
            F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}")
            for i in range(dim)
        ]
    )
    return wide.select(
        "label", F.posexplode(F.array(*[F.col(f"c{i}") for i in range(dim)]))
    ).select(
        "label",
        (F.col("pos") + 1).cast("bigint").alias("pos"),
        (F.round(F.col("col"), 6) + F.lit(0.0)).alias("centroid"),
    )


@query(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id,
           round({_DOT.format(a='e.embedding', b='q.qe')}
                 / ({_NORM.format(a='e.embedding', b='e.embedding')}
                    * {_NORM.format(a='q.qe', b='q.qe')}), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id ASC
    LIMIT {K}
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{K} for a fixed query vector. The query row is
    resolved once at plan-build time and embedded as an array literal
    (cosine_topk_lit), so every execution is one corpus pass + TakeOrdered —
    no per-run broadcast-build job. Scores are identical to the join form:
    same fold order, same rounding."""
    e = _emb(spark, sf_dir)
    qrow = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(as_double(F.col("embedding")).alias("v"))
        .head()
    )
    if qrow is None:
        raise ValueError(
            f"query vec {QUERY_VEC_ID} not found in embeddings at {sf_dir}"
        )
    qvec = qrow[0]
    return cosine_topk_lit(
        e, qvec, "vec_id", "embedding", exclude_id=QUERY_VEC_ID, k=K
    )


PROBE_VEC_ID = 42


@query(
    "ivf_probe_knn",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS centroid_id, embedding AS se
        FROM embeddings WHERE vec_id < {N_SEEDS}
    ),
    scored AS (
        SELECT e.vec_id, s.centroid_id,
               round({_DOT.format(a='e.embedding', b='s.se')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='s.se', b='s.se')}), 6) AS cosine
        FROM embeddings e CROSS JOIN seeds s
    ),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
            ) AS rn FROM scored
        ) WHERE rn = 1
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
    qc AS (SELECT centroid_id FROM assign WHERE vec_id = {PROBE_VEC_ID}),
    cluster AS (
        SELECT e.vec_id, e.embedding
        FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        JOIN qc ON a.centroid_id = qc.centroid_id
    )
    SELECT c.vec_id,
           round({_DOT.format(a='c.embedding', b='q.qe')}
                 / ({_NORM.format(a='c.embedding', b='c.embedding')}
                    * {_NORM.format(a='q.qe', b='q.qe')}), 6) AS cosine
    FROM cluster c, q
    WHERE c.vec_id <> {PROBE_VEC_ID}
    ORDER BY cosine DESC, c.vec_id ASC
    LIMIT {K}
    """,
)
def ivf_probe_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-{K} via IVF probe: brute-force only the query's coarse
    cluster (1/{N_SEEDS} of the corpus) — the scale path where the
    assignment table is partition-pruned by centroid_id."""
    e = _emb(spark, sf_dir)
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    q = e.where(F.col("vec_id") == PROBE_VEC_ID)
    return ivf_probe_topk(e, seeds, q, "vec_id", "embedding", k=K)


@query(
    "ivf_assignments",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS centroid_id, embedding AS se
        FROM embeddings WHERE vec_id < {N_SEEDS}
    ),
    scored AS (
        SELECT e.vec_id, s.centroid_id,
               round({_DOT.format(a='e.embedding', b='s.se')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='s.se', b='s.se')}), 6) AS cosine
        FROM embeddings e CROSS JOIN seeds s
    )
    SELECT vec_id, centroid_id, cosine FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
        ) AS rn FROM scored
    ) WHERE rn = 1
    """,
)
def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: nearest of {N_SEEDS} seed centroids per
    vector (broadcast seeds + argmax winner kernel). At scale the output is
    written partitioned by centroid_id so ANN probes prune partitions."""
    e = _emb(spark, sf_dir)
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    return ivf_assign(e, seeds, "vec_id", "embedding")


from ..operators.similarity import random_planes

RP_PLANES = random_planes(64, 8, seed=3696)


def _rp_bucket_sql() -> str:
    bits = []
    for p in RP_PLANES:
        lit = "list_value(" + ", ".join(repr(v) for v in p) + ")"
        d = _DOT.format(a="embedding", b=lit)
        bits.append(f"CASE WHEN round({d}, 6) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


@query(
    "rp_lsh_vec_buckets",
    oracle=f"""
    SELECT vec_id, {_rp_bucket_sql()} AS bucket
    FROM embeddings
    """,
)
def rp_lsh_vec_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (sign-bit) LSH buckets — the hyperplane ANN path
    beside IVF: 8 seeded deterministic planes, bucket = 8-bit sign string.
    A pure projection (no shuffle); at scale the bucket is the partition /
    bucketBy column and probes prune to bucket + Hamming-1 neighbours
    (operators/similarity.rp_lsh_topk). Oracle inlines the identical plane
    literals, so the sign arithmetic is checked cross-engine."""
    from ..operators.similarity import rp_bucket_col

    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id", rp_bucket_col(F.col("embedding"), RP_PLANES).alias("bucket")
    )


EMB_DIM = 64


@query(
    "embedding_gram",
    oracle="""
    WITH ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS v
        FROM embeddings
    )
    SELECT a.i AS i, b.i AS j, count(*) AS n_vecs,
           round(sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) / count(*),
                 6) AS m_ij
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def embedding_gram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular second-moment (Gram) matrix of the embedding corpus
    — the covariance/PCA building block (operators/similarity.gram_matrix).
    Spark computes one d×d numpy partial per partition (mapInPandas) and
    ships partitions×d² rows, never the n×d² explode the oracle's
    self-join materializes — the differential proves the partial-sum
    algebra against a structurally different evaluation."""
    from ..operators.similarity import gram_matrix

    return gram_matrix(_emb(spark, sf_dir), "embedding", EMB_DIM)


@query(
    "embedding_correlation",
    oracle="""
    WITH ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS v
        FROM embeddings
    ),
    mu AS (
        SELECT i, sum(CAST(v AS DOUBLE)) / count(*) AS mu FROM ex GROUP BY i
    ),
    g AS (
        SELECT a.i AS i, b.i AS j, count(*) AS n_vecs,
               sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) / count(*) AS m
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    )
    SELECT g.i, g.j, g.n_vecs,
           round((g.m - m1.mu * m2.mu)
                 / sqrt((d1.m - m1.mu * m1.mu) * (d2.m - m2.mu * m2.mu)),
                 5) AS corr
    FROM g
    JOIN mu m1 ON m1.i = g.i
    JOIN mu m2 ON m2.i = g.j
    JOIN g d1 ON d1.i = g.i AND d1.j = g.i
    JOIN g d2 ON d2.i = g.j AND d2.j = g.j
    """,
)
def embedding_correlation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the embedding dimensions — the
    feature-redundancy screen a training pipeline runs before projecting.
    Same moment formula on both engines (no stddev-builtin semantics to
    reconcile); margins to the 5-decimal rounding boundary were measured
    at >=1000x the cross-engine accumulation error before pinning the
    round (operators/similarity.correlation_matrix)."""
    from ..operators.similarity import correlation_matrix

    return correlation_matrix(_emb(spark, sf_dir), "embedding", EMB_DIM)


@query("pca_explained_variance")  # rows-only: an eigensolve has no SQL form
def pca_explained_variance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explained-variance spectrum of the top-8 principal components of the
    embedding corpus (operators/similarity.pca_components: distributed
    moments -> driver-side d×d eigensolve — the iterative-algorithm class
    the driver records as rows-only, like the HLL variant). Deterministic:
    moments are exact up to float addition order, eigenvalues are sorted,
    ratios rounded."""
    from ..operators.similarity import pca_components

    comps, vals, _mu, n = pca_components(_emb(spark, sf_dir), "embedding", EMB_DIM, k=8)
    total = sum(float(v) for v in vals)
    rows = [
        (i + 1, round(float(v), 6), round(float(v) / total, 6))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue_r double, explained_of_top8 double"
    )


KMEANS_K = 8
KMEANS_ITERS = 3


def _kmeans_oracle(k: int, n_iter: int) -> str:
    parts = [
        """ex AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               round(CAST(unnest(embedding) AS DOUBLE), 3) AS v
        FROM embeddings
    )""",
        f"""init AS MATERIALIZED (
        SELECT vec_id, rn AS c FROM (
            SELECT vec_id, row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM embeddings
        ) WHERE rn <= {k}
    )""",
        """c0 AS MATERIALIZED (
        SELECT init.c, e.i, e.v AS w FROM init JOIN ex e USING (vec_id)
    )""",
    ]
    for t in range(n_iter):
        parts.append(
            f"""dist{t} AS MATERIALIZED (
        SELECT e.vec_id, c.c,
               round(sum((e.v - c.w) * (e.v - c.w)), 6) AS d
        FROM ex e JOIN c{t} c ON c.i = e.i
        GROUP BY e.vec_id, c.c
    )"""
        )
        parts.append(
            f"""assign{t} AS MATERIALIZED (
        SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER (
                PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
            FROM dist{t}
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""c{t + 1} AS MATERIALIZED (
        SELECT a.c, e.i, round(sum(e.v) / count(*), 6) AS w
        FROM assign{t} a JOIN ex e USING (vec_id)
        GROUP BY a.c, e.i
    )"""
        )
    chain = ",\n    ".join(parts)
    return f"""
    WITH {chain}
    SELECT c AS cluster, i AS dim_i, w AS w_r FROM c{n_iter}
    """


@query("kmeans_centroids", oracle=_kmeans_oracle(KMEANS_K, KMEANS_ITERS))
def kmeans_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means (k=8, 3 iterations) over the embedding corpus — the
    proper trainer for the IVF coarse quantizer. The Spark kernel
    (operators/similarity.kmeans_fit) re-broadcasts rounded centroid
    literals per iteration; the oracle unrolls the identical exact-grid
    recipe (3-decimal input quantization, 6-decimal centroid/distance
    rounding, md5 init order, cluster-id tie-break) as chained
    MATERIALIZED CTEs — same fixpoint from two entirely different
    executions."""
    from ..operators.similarity import kmeans_fit

    cents = kmeans_fit(
        _emb(spark, sf_dir), "vec_id", "embedding", EMB_DIM, KMEANS_K, KMEANS_ITERS
    )
    rows = [
        (cid, i + 1, float(w)) for cid, ws in cents for i, w in enumerate(ws)
    ]
    return spark.createDataFrame(rows, "cluster int, dim_i int, w_r double")


@query(
    "kmeans_cluster_sizes",
    oracle=_kmeans_oracle(KMEANS_K, KMEANS_ITERS).replace(
        f"SELECT c AS cluster, i AS dim_i, w AS w_r FROM c{KMEANS_ITERS}",
        f"""SELECT c AS cluster, count(*) AS size FROM (
        SELECT vec_id, c FROM (
            SELECT d.vec_id, d.c, row_number() OVER (
                PARTITION BY d.vec_id ORDER BY d.d ASC, d.c ASC) AS rn
            FROM (
                SELECT e.vec_id, c.c,
                       round(sum((e.v - c.w) * (e.v - c.w)), 6) AS d
                FROM ex e JOIN c{KMEANS_ITERS} c ON c.i = e.i
                GROUP BY e.vec_id, c.c
            ) d
        ) WHERE rn = 1
    ) GROUP BY c""",
    ),
)
def kmeans_cluster_sizes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cluster occupancy under the trained k-means centroids — the
    IVF list-size balance check (a skewed list ruins probe pruning). One
    extra map-only assignment pass with the fitted centroids as literals;
    the oracle extends the unrolled-CTE chain with the same assignment."""
    from ..operators.similarity import kmeans_fit

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, "vec_id", "embedding", EMB_DIM, KMEANS_K, KMEANS_ITERS)
    base = emb.select(
        F.transform(F.col("embedding"), lambda x: F.round(x.cast("double"), 3)).alias(
            "__v"
        )
    )
    cands = F.array(
        *[
            F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("__v"),
                            F.array(*[F.lit(x) for x in wvec]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("d"),
                F.lit(cid).alias("c"),
            )
            for cid, wvec in cents
        ]
    )
    return (
        base.select(F.array_min(cands).getField("c").alias("cluster"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"))
    )


@query(
    "vec_sparsity_profile",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           len(list_filter(embedding, x -> abs(x) < 0.05)) AS n_nearzero,
           round(len(list_filter(embedding, x -> abs(x) < 0.05)) * 1.0
                 / len(embedding), 6) AS nearzero_frac
    FROM embeddings
    """,
)
def vec_sparsity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector near-zero sparsity profile — the embedding-health audit
    (collapsed or dead dimensions show up as mass near zero; quantization
    planning reads the same histogram). Pure per-row JVM array filter/size
    — no UDF, no shuffle, map-only at any scale; the comparison reads the
    stored float32 against a double literal under the same IEEE widening
    on both engines, so no arithmetic drift is possible."""
    e = _emb(spark, sf_dir)
    nz = F.size(F.filter(F.col("embedding"), lambda x: F.abs(x) < 0.05))
    return e.select(
        "vec_id",
        F.size(F.col("embedding")).alias("dim"),
        nz.alias("n_nearzero"),
        F.round(nz * 1.0 / F.size(F.col("embedding")), 6).alias(
            "nearzero_frac"
        ),
    )


@query(
    "vec_component_range",
    oracle="""
    WITH comp AS (
        SELECT u.i AS dim_idx, embedding[u.i + 1] AS v
        FROM embeddings, unnest(range(0, 8)) AS u(i)
    )
    SELECT CAST(dim_idx AS BIGINT) AS dim_idx,
           min(v) AS min_val, max(v) AS max_val,
           count(*) AS n
    FROM comp GROUP BY dim_idx
    """,
)
def vec_component_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension value range over the first 8 embedding components —
    the quantization-calibration statistic (min/max per dim sizes the
    int8 scale). min/max involve NO arithmetic, only comparisons of the
    stored float32 values, so the result is drift-free on both engines
    (the reason this reports range, not mean/std). Posexplode of a fixed
    slice + one tiny-key groupBy."""
    e = _emb(spark, sf_dir)
    comp = e.select(
        F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("dim_idx", "v")
    )
    return comp.groupBy(F.col("dim_idx").cast("bigint").alias("dim_idx")).agg(
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "centroid_pair_distances",
    oracle="""
    WITH cent AS (
        SELECT label, u.pos AS pos,
               CAST(round(avg(u.val) * 1000000) AS BIGINT) AS cq
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> struct_pack(pos := i,
                                           val := CAST(embedding[i] AS DOUBLE))))
                       AS u
            FROM embeddings
        )
        GROUP BY label, u.pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(CAST(CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT)
                      AS DOUBLE)) / 1000000.0, 6) AS dist
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def centroid_pair_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-centroid Euclidean distance matrix — the cluster-separation
    diagnostic read off k-means/IVF training (nearly-coincident centroids
    mean wasted clusters; at serving time it bounds how aggressively IVF
    can prune probes). Centroids come from the same posexplode->avg plan
    as label_centroids; each mean is then QUANTIZED to integer micro-units
    so the pairwise sum-of-squares accumulates EXACTLY (engine-order-free)
    and only the final sqrt/scale is float — the same cross-engine
    determinism contract as the cents arithmetic in tpch. The pair join
    runs on pos over a k x dim table (k^2 x dim intermediate, independent
    of corpus size) — at 100 TB this is a driver-negligible epilogue to
    the centroid aggregate, which itself shuffles only k x dim partials."""
    e = _emb(spark, sf_dir)
    cent = (
        e.select("label", F.posexplode(as_double(F.col("embedding"))))
        .select("label", (F.col("pos") + 1).alias("pos"), "col")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col") * 1000000).cast("bigint").alias("cq"))
    )
    a = cent.alias("a")
    b = cent.alias("b")
    d2 = (F.col("a.cq") - F.col("b.cq")) * (F.col("a.cq") - F.col("b.cq"))
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.round(
                F.sqrt(F.sum(d2).cast("double")) / 1000000.0, 6
            ).alias("dist")
        )
    )


SEMDEDUP_COS = 0.3


@query(
    "semantic_bucket_dups",
    oracle=f"""
    WITH bk AS (
        SELECT vec_id, embedding, {_rp_bucket_sql()} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket AS bucket,
           round({_DOT.format(a='a.embedding', b='b.embedding')}
                 / ({_NORM.format(a='a.embedding', b='a.embedding')}
                    * {_NORM.format(a='b.embedding', b='b.embedding')}), 6)
               AS cosine
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
                / ({_NORM.format(a='a.embedding', b='a.embedding')}
                   * {_NORM.format(a='b.embedding', b='b.embedding')}), 6)
          >= {SEMDEDUP_COS}
    """,
)
def semantic_bucket_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pass: exact cosine >= 0.3 computed
    ONLY within random-projection LSH buckets (the 8 seeded sign-bit
    planes of rp_lsh_vec_buckets). This is the embedding-space scale play:
    the bucket key bounds candidate volume to sum of bucket sizes squared
    — no all-pairs join — and at 100 TB the bucket is the partition key
    (embedding_near_dups' label blocking needs labels; this needs only the
    vectors). Same fold-ordered dot/norm arithmetic as knn_bruteforce, so
    scores differentially match the oracle's identical plane literals."""
    from ..operators.similarity import cosine, rp_bucket_col

    e = _emb(spark, sf_dir)
    d = e.select(
        "vec_id",
        rp_bucket_col(F.col("embedding"), RP_PLANES).alias("bucket"),
        as_double(F.col("embedding")).alias("v"),
    )
    a = d.select(
        F.col("vec_id").alias("a_id"), "bucket", F.col("v").alias("va")
    )
    b = d.select(
        F.col("vec_id").alias("b_id"), "bucket", F.col("v").alias("vb")
    )
    cos = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "bucket", cos.alias("cosine"))
        .where(F.col("cosine") >= SEMDEDUP_COS)
    )


RECALL_PROBE_IDS = (42, 123, 250, 375, 499)


@query(
    "ivf_recall_audit",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id IN {RECALL_PROBE_IDS}
    ),
    scored AS (
        SELECT p.query_id, e.vec_id,
               round({_DOT.format(a='e.embedding', b='p.qe')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='p.qe', b='p.qe')}), 6) AS cosine
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id <> p.query_id
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rn FROM scored
        ) WHERE rn <= {K}
    ),
    seeds AS (
        SELECT vec_id AS centroid_id, embedding AS se
        FROM embeddings WHERE vec_id < {N_SEEDS}
    ),
    sscored AS (
        SELECT e.vec_id, s.centroid_id,
               round({_DOT.format(a='e.embedding', b='s.se')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='s.se', b='s.se')}), 6) AS cosine
        FROM embeddings e CROSS JOIN seeds s
    ),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
            ) AS rn FROM sscored
        ) WHERE rn = 1
    ),
    ivf AS (
        SELECT query_id, vec_id FROM (
            SELECT s.query_id, s.vec_id, s.cosine,
                   row_number() OVER (
                       PARTITION BY s.query_id
                       ORDER BY s.cosine DESC, s.vec_id ASC
                   ) AS rn
            FROM scored s
            JOIN assign a ON a.vec_id = s.vec_id
            JOIN assign aq ON aq.vec_id = s.query_id
                          AND aq.centroid_id = a.centroid_id
        ) WHERE rn <= {K}
    )
    SELECT e.query_id,
           count(*) AS n_exact,
           (SELECT count(*) FROM ivf i2 WHERE i2.query_id = e.query_id)
               AS n_ivf,
           count(i.vec_id) AS n_overlap,
           round(count(i.vec_id) * 1.0 / count(*), 6) AS recall
    FROM exact e
    LEFT JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN calibration audit — the similarity-search counterpart of
    minhash_jaccard_calibration: for {len(RECALL_PROBE_IDS)} fixed probe
    vectors, recall@{K} of the IVF single-cluster probe against the exact
    brute-force top-{K}. This is the measurement that sizes nprobe /
    seed count before a 100 TB index commits to them: low recall here
    means more probes or finer coarse quantization, not a broken index.
    Both top-k cuts rank on the 6-dp-rounded cosine with a vec_id
    tie-break, so the cut is cross-engine identical; the probe-side scan
    is one corpus pass scoring all probes at once (broadcast probe
    literals), never one job per query."""
    e = _emb(spark, sf_dir)
    probes = e.where(F.col("vec_id").isin(*RECALL_PROBE_IDS)).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qe"),
    )
    # the embeddings table fits a couple of parquet splits at probe
    # tiers, so WITHOUT a repartition both cosine passes (probe scoring
    # and the seed argmin inside ivf_assign) stream through 2 tasks —
    # the intrinsic_dim_2nn single-task-NLJ lesson; spread the streamed
    # side across the cluster
    e = e.repartition(64, "vec_id")
    corpus = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    # consumed by BOTH the exact and the IVF top-k cuts: checkpoint the
    # (query_id, vec_id, cosine) scores — 3 narrow scalars per row is
    # far cheaper to materialize than re-running the d-dim cosine pass
    # over the corpus per consumer
    scored = (
        corpus.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qe")), 6).alias("cosine"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("query_id", "vec_id")
    )
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    # consumed twice (the IVF join + the probe-assignment lookup):
    # checkpoint the 2-column assignment so the corpus x seeds argmin
    # pass runs once
    assign = ivf_assign(e, seeds, "vec_id", "embedding").select(
        "vec_id", "centroid_id"
    ).localCheckpoint(eager=False)
    # only the PROBES' assignments broadcast (5 rows) — broadcasting the
    # full assignment table would ship a corpus-sized build to every
    # executor (the size-misestimate hazard jaccard_verify pins against)
    qassign = (
        assign.where(F.col("vec_id").isin(*RECALL_PROBE_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("centroid_id").alias("q_centroid"),
        )
    )
    ivf = (
        scored.join(assign, "vec_id")
        .join(F.broadcast(qassign), "query_id")
        .where(F.col("centroid_id") == F.col("q_centroid"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("query_id", "vec_id")
        # K x n_probes rows, two consumers (the count + the hit join)
        .localCheckpoint(eager=False)
    )
    n_ivf = ivf.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ivf"))
    return (
        exact.join(ivf.withColumn("__hit", F.lit(1)), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit").alias("n_overlap"),
        )
        .join(F.broadcast(n_ivf), "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_ivf", F.lit(0)).alias("n_ivf"),
            "n_overlap",
            F.round(F.col("n_overlap") * 1.0 / F.col("n_exact"), 6).alias(
                "recall"
            ),
        )
    )


@query(
    "knn_label_agreement",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS query_id, label AS q_label, embedding AS qe
        FROM embeddings WHERE vec_id IN {RECALL_PROBE_IDS}
    ),
    scored AS (
        SELECT p.query_id, p.q_label, e.vec_id, e.label,
               round({_DOT.format(a='e.embedding', b='p.qe')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='p.qe', b='p.qe')}), 6) AS cosine
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id <> p.query_id
    ),
    topk AS (
        SELECT query_id, q_label, label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rn FROM scored
        ) WHERE rn <= {K}
    )
    SELECT query_id, CAST(max(q_label) AS BIGINT) AS label,
           count(*) AS k,
           CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_same,
           round(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS agreement
    FROM topk GROUP BY query_id
    """,
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality sanity: for each probe vector, the fraction of
    its exact top-{K} cosine neighbors sharing its label — the
    neighborhood-purity score that validates an embedding space before
    ANY downstream use (low agreement means the labels and the geometry
    disagree; dedup/ANN thresholds tuned on such a space are noise).
    Same one-pass all-probes scoring and deterministic rounded-cosine
    k-cut as ivf_recall_audit."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    e = _emb(spark, sf_dir)
    probes = e.where(F.col("vec_id").isin(*RECALL_PROBE_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        as_double(F.col("embedding")).alias("qe"),
    )
    corpus = e.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    scored = (
        corpus.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_label",
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qe")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    topk = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= K
    )
    same = F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
    return topk.groupBy("query_id").agg(
        F.max("q_label").cast("bigint").alias("label"),
        F.count(F.lit(1)).alias("k"),
        same.cast("bigint").alias("n_same"),
        F.round(same * 1.0 / F.count(F.lit(1)), 6).alias("agreement"),
    )


@query(
    "vec_quantization_error",
    oracle=f"""
    WITH m AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
               embedding
        FROM embeddings
    )
    SELECT vec_id,
           round(maxabs, 6) AS maxabs,
           round(sqrt(list_sum(list_transform(range(1, len(embedding)+1),
               i -> (CAST(embedding[i] AS DOUBLE)
                     - round(127 * CAST(embedding[i] AS DOUBLE) / maxabs)
                       * maxabs / 127)
                    * (CAST(embedding[i] AS DOUBLE)
                       - round(127 * CAST(embedding[i] AS DOUBLE) / maxabs)
                         * maxabs / 127)))), 6) AS l2_err,
           round(sqrt(list_sum(list_transform(range(1, len(embedding)+1),
               i -> (CAST(embedding[i] AS DOUBLE)
                     - round(127 * CAST(embedding[i] AS DOUBLE) / maxabs)
                       * maxabs / 127)
                    * (CAST(embedding[i] AS DOUBLE)
                       - round(127 * CAST(embedding[i] AS DOUBLE) / maxabs)
                         * maxabs / 127))))
                 / {_NORM.format(a='embedding', b='embedding')}, 6)
               AS rel_err
    FROM m WHERE maxabs > 0
    """,
)
def vec_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric-quantization audit: per vector, the L2
    reconstruction error of round-to-127-grid quantization (the standard
    8-bit ANN/storage compression) absolute and relative to the vector's
    norm — the measurement that decides whether an index can store int8
    and re-rank in float. Map-only array arithmetic, zero shuffles; the
    per-component round is exact on both engines (HALF_UP and
    half-away-from-zero agree at every sign because both round away from
    zero), and the residual fold is the same ordered array sum the
    certified norm kernel uses."""
    e = _emb(spark, sf_dir)
    v = as_double(F.col("embedding"))
    # internal name __maxabs, NOT maxabs: the output select aliases a
    # ROUNDED maxabs, and Spark's lateral column alias resolution would
    # otherwise bind the lambda's F.col("maxabs") to that rounded alias —
    # silently quantizing against the 6-dp scale (caught by the oracle:
    # 43/500 rows off by 1e-6)
    d = e.select(
        "vec_id",
        v.alias("v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("__maxabs"),
    ).where(F.col("__maxabs") > 0)
    resid = F.zip_with(
        F.col("v"),
        F.transform(
            F.col("v"),
            lambda x: F.round(x * 127 / F.col("__maxabs"))
            * F.col("__maxabs")
            / 127,
        ),
        lambda x, q: (x - q) * (x - q),
    )
    l2_err = F.sqrt(
        F.aggregate(resid, F.lit(0.0), lambda acc, x: acc + x)
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return d.select(
        "vec_id",
        F.round(F.col("__maxabs"), 6).alias("maxabs"),
        F.round(l2_err, 6).alias("l2_err"),
        F.round(l2_err / norm, 6).alias("rel_err"),
    )


@query(
    "embedding_dim_variance",
    oracle="""
    WITH comp AS (
        SELECT u.pos, CAST(round(u.val * 1e6) AS BIGINT) AS vm
        FROM (
            SELECT unnest(list_transform(range(1, len(embedding) + 1),
                   i -> struct_pack(pos := i,
                                    val := CAST(embedding[i] AS DOUBLE)))) AS u
            FROM embeddings
        )
    ),
    m AS (
        SELECT pos, count(*) AS n, sum(vm) AS s, sum(vm * vm) AS q
        FROM comp GROUP BY pos
    )
    SELECT CAST(pos AS BIGINT) AS pos,
           round(CAST(n * q - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12, 6)
               AS variance
    FROM m
    ORDER BY variance DESC, pos ASC
    LIMIT 16
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking (top 16) — the PCA-lite diagnostic
    with an EXACT oracle (the eigensolve itself is rows-only by nature;
    this is its differentially-certifiable cousin): low-variance
    dimensions are pruning candidates before quantization/indexing.
    Components micro-quantize to integers, per-dimension population
    variance assembles from exact moment sums (n·q - s² — products of
    sums, decimal accumulators), and the top-k cut orders on the exact
    integer numerator scaled by a constant, with a pos tie-break."""
    e = _emb(spark, sf_dir)
    dec = "decimal(38,0)"
    comp = e.select(
        F.posexplode(as_double(F.col("embedding")))
    ).select(
        (F.col("pos") + 1).alias("pos"),
        F.round(F.col("col") * 1e6).cast("long").alias("vm"),
    )
    m = comp.groupBy("pos").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("vm").cast(dec)).alias("s"),
        F.sum((F.col("vm") * F.col("vm")).cast(dec)).alias("q"),
    )
    var = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    ) / 1e12
    return (
        m.select(
            F.col("pos").cast("bigint").alias("pos"),
            F.round(var, 6).alias("variance"),
        )
        .orderBy(F.col("variance").desc(), F.col("pos").asc())
        .limit(16)
    )


MUTUAL_K = 5


# Shared mutual-kNN SQL pieces: the exact chain (all-pairs candidates),
# the bucketed chain (RP-LSH bucket-bounded candidates), and the pair
# extraction — one source of truth for the exact query, the bucketed
# query, and the recall audit that compares them. CTE names are suffixed
# so both chains can coexist in one statement.
_MKNN_COS = f"""round({_DOT.format(a='a.embedding', b='b.embedding')}
                     / ({_NORM.format(a='a.embedding', b='a.embedding')}
                        * {_NORM.format(a='b.embedding', b='b.embedding')}),
                     6)"""


def _mknn_ctes(sfx: str, candidates: str) -> str:
    return f"""
    scored_{sfx} AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               a.label AS q_label, b.label AS n_label,
               {_MKNN_COS} AS cosine
        FROM {candidates}
    ),
    nbrs_{sfx} AS (
        SELECT qid, nid, q_label, n_label, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cosine DESC, nid ASC
            ) AS rn FROM scored_{sfx}
        ) WHERE rn <= {MUTUAL_K}
    ),
    pairs_{sfx} AS (
        SELECT x.qid AS vec_id_a, x.nid AS vec_id_b, x.cosine,
               CAST(CASE WHEN x.q_label = x.n_label THEN 1 ELSE 0 END
                    AS BIGINT) AS same_label
        FROM nbrs_{sfx} x JOIN nbrs_{sfx} y
          ON y.qid = x.nid AND y.nid = x.qid
        WHERE x.qid < x.nid
    )"""


_MKNN_EXACT_CTES = (
    "v_mk AS (SELECT vec_id, label, embedding FROM embeddings),"
    + _mknn_ctes("ex", "v_mk a JOIN v_mk b ON a.vec_id <> b.vec_id")
)


@query(
    "mutual_knn_pairs",
    oracle=f"""
    WITH {_MKNN_EXACT_CTES}
    SELECT * FROM pairs_ex
    """,
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL nearest-neighbor pairs over EXACT all-pairs candidates —
    the calibration baseline for :func:`mutual_knn_bucketed`, which is
    the documented default at scale (this one's scoring pass is a
    deliberate n² crossJoin so the audit has ground truth; never run it
    on a full corpus). Semantics: (a, b) such that b is in a's exact
    cosine top-{MUTUAL_K} AND a is in b's — the high-precision subset of
    the kNN graph (mutual edges are the standard seed for SemDeDup-style
    semantic dedup and for clustering, because one-sided neighbors of a
    hub vector are mostly noise). Determinism: cosine rounds to 6dp
    BEFORE the rank (same sequential fold both engines), rank ties break
    on neighbor id, the mutuality join is exact set algebra, and a < b
    canonicalizes each pair once. The window + reciprocal-join tail only
    ever sees n·k rows; mutual_knn_recall_audit measures what the
    bucket-bounded candidate generator loses vs this ground truth."""
    e = _emb(spark, sf_dir)
    v = e.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    a = v.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("v").alias("va"),
    )
    b = v.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("n_label"),
        F.col("v").alias("vb"),
    )
    # crossJoin compiles to BroadcastNestedLoopJoin whose output
    # partitioning is the STREAMED side's — a 1-2-file parquet read would
    # serialize the n² scoring onto 2 cores (observed at the 10x tier:
    # one straggler task owning 200M pairs). Repartitioning the query
    # side costs one n-row shuffle and buys full-cluster parallelism for
    # the quadratic stage.
    cands = (
        a.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(b)
        .where(F.col("qid") != F.col("nid"))
    )
    return _mutual_topk_pairs(cands)


def _topk_nbrs(cands: DataFrame) -> DataFrame:
    """Score (qid, nid) candidate rows (columns qid/nid/q_label/n_label/
    va/vb) and window each query to its top-``MUTUAL_K`` — the kNN-list
    kernel shared by the mutual-pair variants and the hubness report."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    scored = cands.select(
        "qid",
        "nid",
        "q_label",
        "n_label",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MUTUAL_K)
        .select("qid", "nid", "q_label", "n_label", "cosine")
    )


def _mutual_topk_pairs(cands: DataFrame) -> DataFrame:
    """Shared mutual-kNN tail: top-k lists (_topk_nbrs), reciprocal join,
    canonicalize a < b. Input size is the only thing the exact and
    bucketed variants disagree on.

    The reciprocity self-join references ``nbrs`` twice, and without a
    lineage cut each reference re-evaluates the ENTIRE candidate scoring
    subtree (the n² crossJoin for the exact variant — plan showed two
    full BroadcastNestedLoopJoin subtrees under the reciprocal
    SortMergeJoin). nbrs is n·k-bounded whatever the candidate volume,
    so the lazy localCheckpoint is always cheap relative to what it
    saves — the round-8 rule (any frame referenced 2+ times across a
    join boundary with an expensive subtree earns a cut)."""
    nbrs = _topk_nbrs(cands).localCheckpoint(eager=False)
    rev = nbrs.select(
        F.col("qid").alias("nid"), F.col("nid").alias("qid")
    )
    return (
        nbrs.join(rev, ["qid", "nid"])
        .where(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("vec_id_a"),
            F.col("nid").alias("vec_id_b"),
            "cosine",
            F.when(F.col("q_label") == F.col("n_label"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("same_label"),
        )
    )


# Multi-probe radius: candidate pairs are those whose 8-bit RP signatures
# differ in <= MKNN_PROBE_RADIUS bits. Radius 2 keeps ~C(8,<=2)/256 = 14.5%
# of random pairs (measured 85% candidate pruning on the synthetic
# embeddings) while recovering ~16x the exact mutual pairs that exact-
# bucket matching (radius 0) finds — the same recall band as the IVF
# probe (ivf_recall_audit). The oracle states the semantics as a Hamming
# predicate; the Spark side realizes it as an exploded XOR-mask equi-join.
MKNN_PROBE_RADIUS = 2
_MKNN_HAM_SQL = (
    f"len(list_filter(range(1, {len(RP_PLANES) + 1}),"
    " i -> a.bucket[i:i] <> b.bucket[i:i]))"
)

_MKNN_BUCKET_CTES = (
    f"bk_mk AS (SELECT vec_id, label, embedding, {_rp_bucket_sql()} AS bucket"
    " FROM embeddings),"
    + _mknn_ctes(
        "bk",
        "bk_mk a JOIN bk_mk b ON "
        f"{_MKNN_HAM_SQL} <= {MKNN_PROBE_RADIUS} AND a.vec_id <> b.vec_id",
    )
)


def _probe_masks(n_bits: int, radius: int) -> list[int]:
    """All XOR masks with popcount <= radius (1 + n + n(n-1)/2 + ... —
    37 for 8 bits at radius 2)."""
    return [m for m in range(1 << n_bits) if bin(m).count("1") <= radius]


@query(
    "mutual_knn_bucketed",
    oracle=f"""
    WITH {_MKNN_BUCKET_CTES}
    SELECT * FROM pairs_bk
    """,
)
def mutual_knn_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN pairs over RP-LSH MULTI-PROBE candidates — the
    documented default: the scale-shaped replacement for
    :func:`mutual_knn_pairs`' exact n² scoring pass. A candidate pair is
    one whose 8-plane sign signatures (the seeded planes of
    rp_lsh_vec_buckets) differ in <= {MKNN_PROBE_RADIUS} bits; the query
    side explodes its signature into the 37 XOR-mask probe keys and
    equi-joins the corpus side's exact signature, so exactly one probe
    key matches per qualifying pair (no dedup needed), candidate volume
    is bounded by probes x bucket sizes — never corpus² — and the probe
    key is the join/partition key at 100 TB (the semantic_bucket_dups
    argument, widened by the standard multi-probe trade: 37x keys on one
    side for ~16x the recall of exact-bucket matching, measured by
    mutual_knn_recall_audit). The scoring/window/reciprocal tail is the
    SAME code as the exact variant (_mutual_topk_pairs), so the two
    differ only in candidate generation. Determinism: inherited from the
    shared tail (rounded cosine before rank, id tie-breaks, canonical
    a < b) plus integer-signature equality."""
    cands = _bucketed_mknn_cands(spark, sf_dir)
    return _mutual_topk_pairs(cands)


def _bucketed_mknn_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe candidate generation shared by mutual_knn_bucketed and
    knn_hubness_histogram: explode each vector's signature into the
    radius-{MKNN_PROBE_RADIUS} XOR-mask probe keys, equi-join the corpus
    side's exact signature."""
    from ..operators.similarity import rp_bucket_col

    e = _emb(spark, sf_dir)
    bucket_int = F.conv(
        rp_bucket_col(F.col("embedding"), RP_PLANES), 2, 10
    ).cast("int")
    d = e.select(
        "vec_id",
        "label",
        bucket_int.alias("bucket"),
        as_double(F.col("embedding")).alias("v"),
    )
    masks = _probe_masks(len(RP_PLANES), MKNN_PROBE_RADIUS)
    a = d.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("probe"),
        F.col("v").alias("va"),
    )
    b = d.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("n_label"),
        F.col("bucket").alias("probe"),
        F.col("v").alias("vb"),
    )
    # The scoring + map-side top-k sort run IN the join's output stage,
    # so its partition count is the compute parallelism for the whole
    # candidate volume. Left to ENSURE_REQUIREMENTS, AQE coalesces the
    # exchange by INPUT bytes (740k exploded rows ~ a few hundred MB)
    # and the 100x-fanout join output then scores on 2 partitions
    # (observed at the 10x tier: one straggler owning the stage).
    # A user REPARTITION_BY_NUM is exempt from AQE coalescing, pinning
    # the stage width; probe keys (256 values) hash ~8 per partition.
    p = a.sparkSession.sparkContext.defaultParallelism
    return (
        a.repartition(p, "probe")
        .join(b, "probe")
        .where(F.col("qid") != F.col("nid"))
    )


@query(
    "mutual_knn_recall_audit",
    oracle=f"""
    WITH {_MKNN_EXACT_CTES},
    {_MKNN_BUCKET_CTES},
    e AS (SELECT vec_id_a, vec_id_b FROM pairs_ex),
    b AS (SELECT vec_id_a, vec_id_b FROM pairs_bk)
    SELECT (SELECT count(*) FROM e) AS n_exact_pairs,
           (SELECT count(*) FROM b) AS n_bucketed_pairs,
           (SELECT count(*) FROM e JOIN b USING (vec_id_a, vec_id_b))
               AS n_common,
           round((SELECT count(*) FROM e JOIN b USING (vec_id_a, vec_id_b))
                 * 1.0 / greatest((SELECT count(*) FROM e), 1), 6)
               AS pair_recall
    """,
)
def mutual_knn_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact calibration for the mutual-kNN family (the
    ivf_recall_audit pattern): how many of the EXACT reciprocal top-k
    pairs the bucket-bounded candidate generator recovers. One row —
    exact pair count, bucketed pair count, their intersection, and pair
    recall. Runs the n² exact path by construction (it IS the ground
    truth), so it lives at audit SFs only; the production default is
    mutual_knn_bucketed alone."""
    from .text import _materialize_release

    # the two pair sets each feed two aggregates (own count + the
    # intersection) — materialize them once (pair lists are n*k-bounded)
    # instead of re-running the scoring subtrees per consumer (plan-audit
    # lead: 16 scans uncheckpointed)
    ex = _materialize_release(
        mutual_knn_pairs(spark, sf_dir).select("vec_id_a", "vec_id_b")
    )
    bk = _materialize_release(
        mutual_knn_bucketed(spark, sf_dir).select("vec_id_a", "vec_id_b")
    )
    n_ex = ex.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_bk = bk.agg(F.count(F.lit(1)).alias("n_bucketed_pairs"))
    n_c = ex.join(bk, ["vec_id_a", "vec_id_b"]).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        n_ex.crossJoin(F.broadcast(n_bk))
        .crossJoin(F.broadcast(n_c))
        .select(
            "n_exact_pairs",
            "n_bucketed_pairs",
            "n_common",
            F.round(
                F.col("n_common")
                * 1.0
                / F.greatest(F.col("n_exact_pairs"), F.lit(1)),
                6,
            ).alias("pair_recall"),
        )
    )


# Reciprocal-rank-fusion parameters (Cormack et al.'s k=60 constant); the
# lexical and semantic lists fuse to depth RRF_DEPTH and the report keeps
# the top RRF_TOP_K. doc_id and vec_id share an id space in the testdata
# (one embedding per document), which is what makes hybrid search joinable.
RRF_K = 60
RRF_DEPTH = 50
RRF_TOP_K = 20


@query(
    "rrf_hybrid_search",
    oracle=None,  # assembled below to reuse the BM25 CTE chain from .text
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval by reciprocal-rank fusion: the BM25 lexical list
    (bm25_scores, text workload) and the embedding cosine list (the
    knn_bruteforce probe) each rank to depth {RRF_DEPTH}, then fuse as
    rrf = 1/({RRF_K}+r_lex) + 1/({RRF_K}+r_sem) — the standard sparse+
    dense combination every RAG/eval stack runs, scored here entirely as
    relational algebra. Determinism: both input ranks order on ROUNDED
    scores with id tie-breaks (total orders), absent ranks report as -1
    sentinels and contribute exactly 0.0, and the two reciprocal terms
    add in fixed textual order before the final round. Plan: each list
    is k-bounded BEFORE fusion (TakeOrdered to {RRF_DEPTH}, then a
    single-partition rank over {RRF_DEPTH} rows — never a global rank
    over the corpus), so the fusion join touches at most 2·{RRF_DEPTH}
    rows regardless of corpus size; the expensive stages are the two
    retrievals themselves, each already argued at scale
    (bm25_scores / knn_bruteforce)."""
    from pyspark.sql import Window

    from .text import bm25_scores

    lex = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "rl",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rl")
    )
    e = _emb(spark, sf_dir)
    qrow = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(as_double(F.col("embedding")).alias("v"))
        .head()
    )
    if qrow is None:
        raise ValueError(
            f"query vec {QUERY_VEC_ID} not found in embeddings at {sf_dir}"
        )
    sem = (
        cosine_topk_lit(
            e, qrow[0], "vec_id", "embedding",
            exclude_id=QUERY_VEC_ID, k=RRF_DEPTH,
        )
        .withColumn(
            "rs",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("sem_id"), "rs")
    )
    fused = lex.join(
        sem, lex["doc_id"] == sem["sem_id"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("sem_id")).alias("doc_id"),
        F.coalesce(F.col("rl"), F.lit(-1)).cast("bigint").alias("lex_rank"),
        F.coalesce(F.col("rs"), F.lit(-1)).cast("bigint").alias("sem_rank"),
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rs")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP_K)


# The RRF oracle reuses the BM25 CTE chain verbatim (imported from the
# text workload, which defines the lexical side) plus the knn probe shape.
def _register_rrf_oracle() -> None:
    from . import ORACLES
    from .text import _BM25_CTES, _BM25_SUM_SQL

    ORACLES["rrf_hybrid_search"] = f"""
    WITH {_BM25_CTES},
    lex AS (
        SELECT doc_id, rl FROM (
            SELECT doc_id, row_number() OVER (
                ORDER BY round({_BM25_SUM_SQL}, 6) DESC, doc_id ASC) AS rl
            FROM pivoted
        ) WHERE rl <= {RRF_DEPTH}
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    sem AS (
        SELECT vec_id, rs FROM (
            SELECT e.vec_id, row_number() OVER (
                ORDER BY round({_DOT.format(a='e.embedding', b='q.qe')}
                      / ({_NORM.format(a='e.embedding', b='e.embedding')}
                         * {_NORM.format(a='q.qe', b='q.qe')}), 6) DESC,
                      e.vec_id ASC) AS rs
            FROM embeddings e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
        ) WHERE rs <= {RRF_DEPTH}
    )
    SELECT coalesce(lex.doc_id, sem.vec_id) AS doc_id,
           CAST(coalesce(lex.rl, -1) AS BIGINT) AS lex_rank,
           CAST(coalesce(sem.rs, -1) AS BIGINT) AS sem_rank,
           round(coalesce(1.0 / ({RRF_K} + lex.rl), 0.0)
                 + coalesce(1.0 / ({RRF_K} + sem.rs), 0.0), 6) AS rrf
    FROM lex FULL JOIN sem ON sem.vec_id = lex.doc_id
    ORDER BY rrf DESC, doc_id ASC
    LIMIT {RRF_TOP_K}
    """


_register_rrf_oracle()


@query(
    "label_cosine_separation",
    oracle="""
    WITH uq AS (
        SELECT label,
               list_transform(range(1, len(embedding) + 1),
                   i -> CAST(round(CAST(embedding[i] AS DOUBLE)
                            / sqrt(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) * 1e6) AS BIGINT)) AS q
        FROM embeddings
    ),
    counts AS (SELECT label, count(*) AS n FROM uq GROUP BY label),
    comp AS (
        SELECT label, u.pos AS pos, u.v AS v FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(q) + 1),
                          i -> struct_pack(pos := i, v := q[i]))) AS u
            FROM uq
        )
    ),
    dims AS (
        SELECT label, pos,
               sum(CAST(v AS HUGEINT)) AS s,
               sum(CAST(v AS HUGEINT) * v) AS qq
        FROM comp GROUP BY label, pos
    ),
    intra AS (
        SELECT label, sum(s * s) AS s2, sum(qq) AS qq
        FROM dims GROUP BY label
    ),
    gdim AS (SELECT pos, sum(s) AS st FROM dims GROUP BY pos),
    agg AS (
        SELECT
            (SELECT sum(n) FROM counts) AS n_all,
            (SELECT count(*) FROM counts) AS nl,
            (SELECT sum(st * st) FROM gdim) AS s2_all,
            (SELECT sum(qq) FROM intra) AS qq_all,
            (SELECT sum(s2) FROM intra) AS s2_intra,
            (SELECT sum(CAST(n AS HUGEINT) * (n - 1) // 2) FROM counts)
                AS n_intra_pairs
    )
    SELECT CAST(n_all AS BIGINT) AS n_vectors,
           CAST(nl AS BIGINT) AS n_labels,
           round(CAST(s2_intra - qq_all AS DOUBLE) / 2
                 / CAST(n_intra_pairs AS DOUBLE) / 1e12, 6)
               AS mean_intra_cosine,
           round(CAST(s2_all - s2_intra AS DOUBLE) / 2
                 / CAST(n_all * (n_all - 1) // 2 - n_intra_pairs AS DOUBLE)
                 / 1e12, 6) AS mean_inter_cosine,
           round(CAST(s2_intra - qq_all AS DOUBLE) / 2
                 / CAST(n_intra_pairs AS DOUBLE) / 1e12
                 - CAST(s2_all - s2_intra AS DOUBLE) / 2
                 / CAST(n_all * (n_all - 1) // 2 - n_intra_pairs AS DOUBLE)
                 / 1e12, 6) AS separation
    FROM agg
    WHERE n_intra_pairs > 0
      AND n_all * (n_all - 1) // 2 - n_intra_pairs > 0
    """,
)
def label_cosine_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra- vs inter-label mean cosine — the cluster-separation
    diagnostic (are the labels real structure?) computed WITHOUT any
    pairwise join: for unit vectors the sum of pairwise dots inside a
    group is (||sum u||^2 - sum ||u||^2) / 2, so per-label and global
    per-dimension SUMS are sufficient statistics and the whole metric is
    one posexplode + two keyed aggregates — O(n d), never n^2 (the same
    algebraic folding as embedding_gram/assortativity). Determinism:
    vectors unit-normalize with the proven sequential-fold norm, then
    micro-quantize to integers, so every sum/square is exact
    (HUGEINT / DECIMAL(38,0) — the products-of-sums overflow
    discipline); the only doubles are the final mirrored divisions.
    Output: one row with vector/label counts, mean intra-label cosine,
    mean inter-label cosine, and their gap."""
    from ..operators.similarity import as_double, l2_norm

    dec = "decimal(38,0)"
    e = _emb(spark, sf_dir)
    d = e.select(
        "label", as_double(F.col("embedding")).alias("v")
    ).withColumn("__n", l2_norm(F.col("v")))
    d = d.select(
        "label",
        F.transform(
            F.col("v"),
            lambda x: F.round(x / F.col("__n") * 1e6).cast("long"),
        ).alias("q"),
    )
    counts = d.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    comp = d.select("label", F.posexplode("q"))
    dims = comp.groupBy("label", "pos").agg(
        F.sum(F.col("col").cast(dec)).alias("s"),
        F.sum((F.col("col").cast(dec) * F.col("col")).cast(dec)).alias("qq"),
    )
    intra = dims.groupBy("label").agg(
        F.sum((F.col("s") * F.col("s")).cast(dec)).alias("s2"),
        F.sum("qq").alias("qq"),
    )
    glob = dims.groupBy("pos").agg(F.sum("s").alias("st"))
    c_agg = counts.agg(
        F.sum("n").alias("n_all"),
        F.count(F.lit(1)).alias("nl"),
        F.expr("sum(n * (n - 1) div 2)").alias("n_intra_pairs"),
    )
    i_agg = intra.agg(
        F.sum("s2").alias("s2_intra"), F.sum("qq").alias("qq_all")
    )
    g_agg = glob.agg(
        F.sum((F.col("st") * F.col("st")).cast(dec)).alias("s2_all")
    )
    one = c_agg.crossJoin(F.broadcast(i_agg)).crossJoin(F.broadcast(g_agg))
    intra_mean = (
        (F.col("s2_intra") - F.col("qq_all")).cast("double")
        / 2
        / F.col("n_intra_pairs").cast("double")
        / 1e12
    )
    inter_pairs = (
        F.expr("n_all * (n_all - 1) div 2") - F.col("n_intra_pairs")
    )
    inter_mean = (
        (F.col("s2_all") - F.col("s2_intra")).cast("double")
        / 2
        / inter_pairs.cast("double")
        / 1e12
    )
    # degenerate-denominator guard, mirrored in the oracle's WHERE: all
    # labels singletons (n_intra_pairs = 0) or a single label
    # (inter_pairs = 0) must drop the row on BOTH engines rather than
    # diverge on NaN vs 0/0 semantics
    return (
        one.where(
            (F.col("n_intra_pairs") > 0) & (inter_pairs > 0)
        ).select(
            F.col("n_all").cast("bigint").alias("n_vectors"),
            F.col("nl").cast("bigint").alias("n_labels"),
            F.round(intra_mean, 6).alias("mean_intra_cosine"),
            F.round(inter_mean, 6).alias("mean_inter_cosine"),
            F.round(intra_mean - inter_mean, 6).alias("separation"),
        )
    )


@query(
    "knn_hubness_histogram",
    oracle=f"""
    WITH {_MKNN_BUCKET_CTES}
    SELECT CAST(deg AS BIGINT) AS in_degree,
           count(*) AS n_vectors
    FROM (SELECT nid, count(*) AS deg FROM nbrs_bk GROUP BY nid)
    GROUP BY deg
    """,
)
def knn_hubness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUBNESS profile of the (bucketed) kNN graph: how many query-side
    top-{MUTUAL_K} lists each vector appears in, histogrammed — the
    classic ANN pathology check (high-dimensional spaces concentrate a
    few hub vectors into everyone's neighbor list, which silently skews
    kNN classification, SemDeDup keeper choice, and mutual-kNN edge
    density; a heavy right tail here says to switch to a reciprocal or
    locally-scaled metric). Reuses the certified multi-probe candidate
    generation + top-k window (_bucketed_mknn_cands/_topk_nbrs — the
    mutual_knn_bucketed kernel, so the audit and the default path stay
    one implementation); in-degree and the histogram are two integer
    aggregates. Vectors in no list (degree 0) drop identically on both
    engines."""
    nbrs = _topk_nbrs(_bucketed_mknn_cands(spark, sf_dir))
    deg = nbrs.groupBy("nid").agg(F.count(F.lit(1)).alias("deg"))
    return deg.groupBy(
        F.col("deg").cast("bigint").alias("in_degree")
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


# ---- round-9 additions -----------------------------------------------------

_ASSIGN_CTE = f"""
    seeds AS (
        SELECT vec_id AS centroid_id, embedding AS se
        FROM embeddings WHERE vec_id < {N_SEEDS}
    ),
    scored AS (
        SELECT e.vec_id, s.centroid_id,
               round({_DOT.format(a='e.embedding', b='s.se')}
                     / ({_NORM.format(a='e.embedding', b='e.embedding')}
                        * {_NORM.format(a='s.se', b='s.se')}), 6) AS cosine
        FROM embeddings e CROSS JOIN seeds s
    ),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
            ) AS rn FROM scored
        ) WHERE rn = 1
    )
"""


@query(
    "ivf_balance_report",
    oracle=f"""
    WITH {_ASSIGN_CTE.strip()},
    occ AS (
        SELECT centroid_id, count(*) AS x
        FROM assign GROUP BY centroid_id
    ),
    ranked AS (
        SELECT x, row_number() OVER (ORDER BY x ASC, centroid_id ASC) AS i
        FROM occ
    )
    SELECT CAST(count(*) AS BIGINT) AS n_centroids,
           CAST(sum(x) AS BIGINT) AS n_vectors,
           CAST(max(x) AS BIGINT) AS max_occupancy,
           CAST(min(x) AS BIGINT) AS min_occupancy,
           round(max(x) * 1.0 / (sum(x) * 1.0 / count(*)), 6)
               AS max_over_mean,
           round(2.0 * sum(i * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
)
def ivf_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF CELL-BALANCE audit: occupancy skew of the certified coarse
    quantization (ivf_assignments' exact argmax) summarized as
    max/min/max-over-mean and the Gini coefficient of the occupancy
    distribution — the ANN health metric that decides whether the
    partition-pruned probe (ivf_probe_knn) actually prunes: a hot cell
    holding half the corpus makes nprobe=1 latency the corpus scan the
    index was built to avoid, and the fix (re-seed, split, or rebalance)
    is triggered by exactly this report. The occupancy table is
    k = {N_SEEDS} rows — the rank window and the closed-form sorted-rank
    Gini run on a CONSTANT-size frame regardless of corpus size; the
    only data-scale work is the certified assignment itself (broadcast
    seeds, one argmax)."""
    from ..operators.similarity import ivf_assign

    e = _emb(spark, sf_dir)
    seeds = e.where(F.col("vec_id") < N_SEEDS)
    occ = (
        ivf_assign(e, seeds, "vec_id", "embedding")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    from pyspark.sql import Window

    ranked = occ.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.asc("x"), F.asc("centroid_id")))
        .alias("i"),
    )
    k = F.count(F.lit(1))
    sx = F.sum("x")
    return ranked.agg(
        k.cast("bigint").alias("n_centroids"),
        sx.cast("bigint").alias("n_vectors"),
        F.max("x").cast("bigint").alias("max_occupancy"),
        F.min("x").cast("bigint").alias("min_occupancy"),
        F.round(F.max("x") * 1.0 / (sx * 1.0 / k), 6).alias("max_over_mean"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (k * sx)
            - (k + 1.0) / k,
            6,
        ).alias("gini"),
    )
