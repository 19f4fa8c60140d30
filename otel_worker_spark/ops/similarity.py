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
    return f"({_dot_spark(a, b)} / (sqrt({_dot_spark(a, a)}) * sqrt({_dot_spark(b, b)})))"


def _cosine_duck(a: str, b: str) -> str:
    return f"({_dot_duck(a, b)} / (sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)})))"


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
