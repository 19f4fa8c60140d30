"""Similarity search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

- brute-force cosine top-k: the exactness baseline. Plan: broadcast
  the (small) query set against the corpus — a broadcast
  nested-loop that scales linearly in corpus size and parallelizes
  perfectly; the only shuffle is the final per-query top-k
  (TakeOrderedAndProject via window row_number).
- LSH (random hyperplanes): the scale path — 16 deterministic ±1
  hyperplanes → a sign-bit bucket per vector; candidate neighbors
  share a bucket, so the join is an equi-join on bucket id instead
  of a cross join. (IVF would replace the hyperplanes with k-means
  centroids; the plumbing — bucket column + equi-join + rerank — is
  identical.)

Dot products are sequential left-folds (``aggregate``/``list_reduce``)
over float→double-widened values, so Spark and the DuckDB oracle are
IEEE-bit-identical; scores are emitted ×10^6 floor-scaled ints.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
EMB_DIM = 64


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" [CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in range(1, len({a}) + 1)]),"
        f" (acc, v) -> acc + v)"
    )


def _cosine_spark(a: str, b: str) -> str:
    # greatest(…, 1e-300) guards the zero-vector norm (ANSI mode turns
    # x/0 into a job abort, not a NULL); any real norm dwarfs it, so
    # nonzero vectors are bit-unchanged and zero vectors score 0
    return (
        f"({_dot_spark(a, b)} / greatest(CAST(1e-300 AS DOUBLE),"
        f" sqrt({_dot_spark(a, a)}) * sqrt({_dot_spark(b, b)})))"
    )


def _cosine_duck(a: str, b: str) -> str:
    return (
        f"({_dot_duck(a, b)} / greatest(CAST(1e-300 AS DOUBLE),"
        f" sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)})))"
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is tiny → broadcast; the corpus never shuffles
    until the per-query top-k."""
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"))
    scored = (
        F.broadcast(queries)
        .join(corpus, F.expr("query_id <> neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"CAST(floor(1000000.0 * {_cosine_spark('q', 'e')}) AS BIGINT)").alias(
                "cosine_u"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_u")
    )


def cosine_topk_sql(n_queries: int = 8, k: int = 5) -> str:
    cos = _cosine_duck("q", "e")
    return f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < {n_queries}
), corpus AS (
  SELECT vec_id AS neighbor_id, embedding AS e FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         CAST(floor(1000000.0 * {cos}) AS BIGINT) AS cosine_u
  FROM queries, corpus WHERE query_id <> neighbor_id
)
SELECT query_id, rank, neighbor_id, cosine_u FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_u DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= {k}
"""


def hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded, embedded as literals in
    both engines)."""
    rng = random.Random(7)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane LSH: bucket = the sign-bit integer over
    ``n_planes`` hyperplane dot products."""
    planes = hyperplanes(n_planes)
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in p) + ")"
        bits.append(
            f"(CASE WHEN {_dot_spark('embedding', arr)} > 0 THEN CAST(pow(2, {i}) AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    return embeddings.select("vec_id", "label", F.expr(bucket).alias("bucket"))


def lsh_buckets_sql(n_planes: int = N_PLANES) -> str:
    planes = hyperplanes(n_planes)
    bits = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in p) + "]"
        bits.append(
            f"(CASE WHEN {_dot_duck('embedding', arr)} > 0 THEN CAST(pow(2, {i}) AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    return f"SELECT vec_id, label, {bucket} AS bucket FROM embeddings"


def lsh_bucket_stats(embeddings: DataFrame) -> DataFrame:
    """Bucket histogram — the skew diagnostic for the ANN scale path."""
    return (
        lsh_buckets(embeddings)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def lsh_bucket_stats_sql() -> str:
    return f"""
SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
FROM ({lsh_buckets_sql()}) t GROUP BY 1
"""


N_CENTROIDS = 16
N_PROBE = 4


def _centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic coarse quantizer: the first ``n_centroids``
    vectors ARE the centroids (production swaps in k-means-trained
    centroids — the plumbing below is identical; determinism keeps the
    DuckDB oracle exact)."""
    return embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c")
    )


def ivf_assignments(embeddings: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF list assignment: every vector → its nearest centroid
    (cosine, floor-scaled for cross-engine tie determinism; tiebreak
    cent_id asc). Plan: broadcast the tiny centroid set, score 16
    candidates per vector map-side, keep the argmax via window — a
    narrow pass over the corpus, no shuffle except the window's
    partition-local sort."""
    cents = _centroids(embeddings, n_centroids)
    cos = _cosine_spark("embedding", "c")
    scored = embeddings.join(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        F.expr(f"CAST(floor(1000000.0 * {cos}) AS BIGINT)").alias("sim_u"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim_u"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("vec_id", "cent_id", "sim_u")
    )


def ivf_assignments_sql(n_centroids: int = N_CENTROIDS) -> str:
    cos = _cosine_duck("embedding", "c")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < {n_centroids}
), scored AS (
  SELECT e.vec_id, cent_id, CAST(floor(1000000.0 * {cos}) AS BIGINT) AS sim_u
  FROM embeddings e, cents
)
SELECT vec_id, cent_id, sim_u FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_u DESC, cent_id ASC) AS rn
  FROM scored
) t WHERE rn = 1
"""


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF approximate top-k: the second ANN scale path next to the
    hyperplane LSH (SURVEY training-data ops; 'an IVF or LSH-bucketed
    variant as the scale path').

    Plan shape — the defining property vs brute force: each query
    probes its ``n_probe`` nearest centroids, and candidates come from
    an EQUI-JOIN on cent_id against the IVF assignments (1/
    (n_centroids/n_probe) of the corpus per query on balanced lists),
    then exact cosine rerank + per-query top-k. No cross join; the
    probe fan-out is broadcast-sized. Recall is approximate by
    construction (a true neighbor assigned to an unprobed list is
    missed) — the oracle replicates the SAME algorithm, so the check
    is exact."""
    cents = _centroids(embeddings, n_centroids)
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    # probe lists per query (n_queries × n_centroids scored rows — tiny)
    qcos = _cosine_spark("q", "c")
    qscored = queries.join(F.broadcast(cents)).select(
        "query_id",
        "q",
        "cent_id",
        F.expr(f"CAST(floor(1000000.0 * {qcos}) AS BIGINT)").alias("sim_u"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim_u"), F.asc("cent_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "q", "cent_id")
    )
    assigned = ivf_assignments(embeddings, n_centroids).join(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e")),
        F.col("vec_id") == F.col("neighbor_id"),
    ).select("neighbor_id", "cent_id", "e")
    cos = _cosine_spark("q", "e")
    cand = (
        F.broadcast(probes)
        .join(assigned, "cent_id")
        .where(F.expr("query_id <> neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"CAST(floor(1000000.0 * {cos}) AS BIGINT)").alias("cosine_u"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_u"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_u")
    )


def ivf_topk_sql(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    qcos = _cosine_duck("q", "c")
    cos = _cosine_duck("q", "e")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < {n_centroids}
), assigned AS ({ivf_assignments_sql(n_centroids)}),
queries AS (
  SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < {n_queries}
), probes AS (
  SELECT query_id, q, cent_id FROM (
    SELECT query_id, q, cent_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY CAST(floor(1000000.0 * {qcos}) AS BIGINT) DESC,
                                       cent_id ASC) AS rn
    FROM queries, cents
  ) t WHERE rn <= {n_probe}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, e.embedding AS e, p.q
  FROM probes p JOIN assigned a USING (cent_id)
  JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, rank, neighbor_id, cosine_u FROM (
  SELECT query_id, neighbor_id,
         CAST(floor(1000000.0 * {cos}) AS BIGINT) AS cosine_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY CAST(floor(1000000.0 * {cos}) AS BIGINT) DESC,
                                     neighbor_id ASC) AS rank
  FROM cand
) t WHERE rank <= {k}
"""


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.35, n_planes: int = 6
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by LSH bucket —
    the equi-join candidate stage + exact verification, i.e. the
    embedding analog of MinHash-LSH dedup. Fewer planes → coarser
    buckets → higher recall at the cost of more candidates (tune per
    corpus; 6 planes / 64 buckets here)."""
    b = lsh_buckets(embeddings, n_planes).join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    x, y = b.alias("x"), b.alias("y")
    cos = _cosine_spark("x.embedding", "y.embedding")
    return (
        x.join(y, "bucket")
        .where(F.expr("x.vec_id < y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.expr(f"CAST(floor(1000000.0 * {cos}) AS BIGINT)").alias("cosine_u"),
        )
        .where(F.col("cosine_u") >= int(threshold * 1_000_000))
    )


def embedding_near_dup_sql(threshold: float = 0.35, n_planes: int = 6) -> str:
    cos = _cosine_duck("x.embedding", "y.embedding")
    return f"""
WITH b AS (
  SELECT t.vec_id, t.bucket, e.embedding
  FROM ({lsh_buckets_sql(n_planes)}) t JOIN embeddings e USING (vec_id)
)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       CAST(floor(1000000.0 * {cos}) AS BIGINT) AS cosine_u
FROM b x JOIN b y USING (bucket)
WHERE x.vec_id < y.vec_id
  AND CAST(floor(1000000.0 * {cos}) AS BIGINT) >= {int(threshold * 1_000_000)}
"""
