"""Exact fixed-point Lloyd k-means + cluster-balanced sampling.

Embedding-space clustering is the backbone of several corpus-curation
passes (SemDeDup's cells, DataComp-style cluster-balanced subsetting,
topic bucketing before mixture weighting). operators/similarity.py
trains float centroids for IVF internally; this module is the
first-class, cross-engine-exact variant: every arithmetic step is
integer, so a SQL engine replays the whole clustering bit-for-bit
and the assignment is a verifiable query, not a heuristic.
Reference analog: none (the reference is a CSV importer) —
training-data surface the brief requires.

Determinism contract:

- Vectors are quantized once: q_i = floor(x_i · scale) as BIGINT
  (float→double widening is exact; double·scale and floor are the
  same IEEE ops in any engine).
- Seeds = the k lowest-id vectors, cid = their id rank.
- Each Lloyd round: assignment = argmin of the integer squared
  distance with (dist, cid) struct-min tie-break; update = per-dim
  floor(sum/count) with the double division exact while |sum| < 2^53
  (64-dim · |q|≤10^5 · 10^12 rows stays inside).
- A cluster that loses all members keeps its previous centroid
  (LEFT JOIN + coalesce — same rule both engines).

Scale shape: one quantize map; per round one broadcast-k cross join
(k rows against N vectors — the sanctioned broadcast-small pattern,
NOT an N×N product) and one map-side-combinable (cid, dim) groupBy;
no driver traffic at all — the centroid table stays a k-row
DataFrame end to end, and rounds chain lazily with an optional
localCheckpoint to bound plan depth. Overflow margin: per-dim diff²
≤ (2·|q|max)², summed over dim then over N partial rows — int64
holds through ~10^12 vectors at scale=1000, dim=64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_import_spark.operators.sketches import portable_hash60

SCALE = 1000


def quantize_expr(vec: Column, scale: int = SCALE) -> Column:
    """array<float> -> array<bigint>: floor(x · scale) per dim."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale).cast("long")
    )


def sqdist_expr(a: Column, b: Column) -> Column:
    """Integer squared L2 distance between two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` exact Lloyd rounds; returns (assignment, centroids)
    where assignment = (id, cid, dist) under the FINAL centroids and
    centroids = (cid, cv array<bigint>). Everything stays a DataFrame;
    no collect."""
    q = vecs.select(
        F.col(id_col), quantize_expr(F.col(vec_col), scale).alias("qv")
    ).localCheckpoint(eager=False)

    seeds = q.orderBy(id_col).limit(k)
    c = seeds.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1)
        .cast("int")
        .alias("cid"),
        F.col("qv").alias("cv"),
    ).localCheckpoint(eager=False)

    def assign(cent: DataFrame) -> DataFrame:
        d = sqdist_expr(F.col("qv"), F.col("cv"))
        return (
            q.crossJoin(F.broadcast(cent))
            .select(
                id_col,
                "qv",
                F.struct(d.alias("d"), F.col("cid").alias("c")).alias("b"),
            )
            .groupBy(id_col)
            .agg(F.min("b").alias("b"), F.first("qv").alias("qv"))
            .select(
                id_col,
                "qv",
                F.col("b.c").alias("cid"),
                F.col("b.d").alias("dist"),
            )
        )

    for _ in range(iters):
        a = assign(c)
        sums = (
            a.select("cid", F.posexplode("qv").alias("i", "v"))
            .groupBy("cid", "i")
            .agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .select(
                "cid",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("long")
                .alias("m"),
            )
        )
        newc = sums.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s["m"],
            ).alias("cv_new")
        )
        c = (
            c.join(newc, "cid", "left")
            .select("cid", F.coalesce("cv_new", "cv").alias("cv"))
            .localCheckpoint(eager=False)
        )

    return assign(c), c


def kmeans_clusters(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Per-cluster summary under the final assignment:
    (cluster_id, n_members, inertia_fp = Σ squared distance)."""
    a, _ = kmeans_fit(vecs, k, iters, id_col, vec_col, scale)
    return a.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("dist").cast("long").alias("inertia_fp"),
    )


def cluster_balanced_sample(
    vecs: DataFrame,
    per_cluster: int = 20,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Deterministic equal-per-cluster subset (the DataComp-style
    balanced draw): within each final cluster rank by the portable
    60-bit hash of the id (a seedless uniform order both engines
    share) and keep the first `per_cluster`:
    (id, cluster_id, samp_rank)."""
    a, _ = kmeans_fit(vecs, k, iters, id_col, vec_col, scale)
    w = Window.partitionBy("cid").orderBy(
        portable_hash60(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        a.withColumn("samp_rank", F.row_number().over(w).cast("int"))
        .where(F.col("samp_rank") <= per_cluster)
        .select(
            id_col,
            F.col("cid").alias("cluster_id"),
            "samp_rank",
        )
    )
