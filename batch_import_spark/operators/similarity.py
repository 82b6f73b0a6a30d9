"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``   — exact brute force: broadcast the query set,
  dot products via zip_with/aggregate expressions (JVM codegen),
  per-query top-k via window. The correctness baseline.
- ``lsh_ann_topk``  — random-hyperplane LSH: deterministic
  hash-derived hyperplanes (no RNG state), sign-bit bucket key,
  multi-probe via several independent tables; candidates re-ranked
  exactly. The scale path: the join keys on (table, bucket) so only
  colliding vectors are compared.

Scale notes: brute force is O(N·Q) — fine when Q is small and
broadcast; LSH turns it into a bucket join whose cost tracks bucket
occupancy. Embedding near-dup detection reuses the same kernels with
query set = corpus (self-join on buckets).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def unit(a: Column) -> Column:
    """Scale to unit L2 norm (zero vectors pass through).

    Normalizing each side ONCE before a similarity join turns the
    per-pair cosine into a bare dot product — at N×Q pairs this
    roughly halves the join-side arithmetic (norms are O(N+Q), not
    O(N·Q)).
    """
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    ``queries(query_id, embedding)`` is broadcast; the corpus is
    scanned once. Returns (query_id, vec_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), unit(F.col(vec_col)).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), unit(F.col(vec_col)).alias("c_vec"))
    scored = c.crossJoin(q).select(
        "query_id",
        "vec_id",
        F.round(dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplane(dim: int, table: int, plane: int, seed: int = 11) -> list[float]:
    """Deterministic pseudo-random unit hyperplane.

    Components derive from a splitmix-style integer hash of
    (seed, table, plane, i) mapped to (-1, 1) — reproducible anywhere,
    no RNG state, no numpy dependency at plan-build time.
    """
    comps = []
    for i in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + table * 0xBF58476D1CE4E5B9 + plane * 0x94D049BB133111EB + i) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        comps.append((x / 2**63) - 1.0)  # uniform-ish in [-1, 1)
    n = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / n for c in comps]


def lsh_bucket(vec: Column, dim: int, table: int, num_planes: int = 12) -> Column:
    """Sign-bit bucket id of ``vec`` for one hash table (expression).

    Plane components stay full-precision doubles so the bucket id is
    reproducible by any engine evaluating the same dot product (the
    DuckDB oracle inlines these constants; a float32 truncation here
    would diverge at sign boundaries).
    """
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, table, p)
        proj = dot(vec, F.array(*[F.lit(float(c)) for c in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


# public alias: oracle-SQL generators need the same plane constants
hyperplane = _hyperplane


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_tables: int = 4,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: union of exact re-ranked bucket collisions
    over ``num_tables`` independent hyperplane tables."""
    c = corpus.select(F.col(id_col).alias("vec_id"), unit(F.col(vec_col)).alias("c_vec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), unit(F.col(vec_col)).alias("q_vec")
    )
    c_buckets = c.select(
        "vec_id",
        "c_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col("c_vec"), dim, t, num_planes).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    )
    q_buckets = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col("q_vec"), dim, t, num_planes).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    )
    cand = (
        c_buckets.join(F.broadcast(q_buckets), "tb")
        .dropDuplicates(["query_id", "vec_id"])
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_tables: int = 4,
    num_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine ≥ threshold) via LSH-bucketed self-join."""
    c = corpus.select(F.col(id_col).alias("id"), unit(F.col(vec_col)).alias("v"))
    buckets = c.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col("v"), dim, t, num_planes).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    )
    left = buckets.select("tb", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    right = buckets.select("tb", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        left.join(right, "tb")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", F.round(dot(F.col("v_a"), F.col("v_b")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
