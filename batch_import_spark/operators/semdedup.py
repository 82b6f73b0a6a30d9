"""SemDeDup — semantic (embedding-space) deduplication.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster the corpus embeddings,
then inside each cluster drop all but one of every group of
semantically near-identical documents (cosine above a threshold).
Unlike MinHash/SimHash (lexical overlap) this catches paraphrases
and re-encodings that share almost no n-grams. Reference analog:
none — brief-side training-data surface.

Determinism contract (both engines replay it exactly):
- clusters are the IVF coarse cells (similarity.py: seed centroids =
  unit vectors of the lowest ids, argmax-dot assignment, lowest-cell
  tie-break);
- within a cell, a vector is DROPPED iff some KEPT vector with a
  lower id has cosine >= threshold with it ("keep the first seen" —
  the deterministic stand-in for SemDeDup's keep-farthest-from-
  centroid rule, which ties on real data). Transitivity is resolved
  greedily by id order exactly like the paper's implementation.

Scale shape: assignment is a zero-shuffle codegen scan; the pairwise
stage self-joins ON THE CELL KEY only, so cost is sum of cell
sizes squared — n_cells is chosen ~sqrt(N) (paper uses ~100k
clusters at web scale) to keep cells bounded, and ``max_cell``
documents the guard: cells larger than it are skipped and counted
rather than allowed to go quadratic (hot-bucket-cap discipline,
default ON like dedup.py).

The greedy keep-first scan inside a cell is a per-cell sequential
rule; it is evaluated with one aggregate over the cell's id-sorted
pair list (collect per cell is bounded by max_cell — same
bounded-by-contract justification as the other capped operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_import_spark.operators.similarity import (
    _nearest_cell,
    cosine,
    ivf_seed_centroids,
)


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    max_cell: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdict.

    Output: (id, cell, keep boolean, dup_of nullable id) — ``dup_of``
    is the lowest-id KEPT witness that evicted the row. Cells larger
    than ``max_cell`` are passed through with keep=true (counted by
    callers via the cell sizes; never quadratic).
    """
    if centroids is None:
        centroids = ivf_seed_centroids(corpus, n_cells, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("cell", _nearest_cell("v", centroids))
    # materialize the assignment once: the small/big split and the two
    # pair-join sides each re-derive this subplan otherwise, running
    # the argmax-dot centroid scan ~4x (at production scale the
    # assignment table is persisted storage anyway)
    c = c.localCheckpoint(eager=False)
    sizes = c.groupBy("cell").agg(F.count(F.lit(1)).alias("n_cell"))
    c = c.join(F.broadcast(sizes), "cell")
    small = c.where(F.col("n_cell") <= max_cell)
    big = c.where(F.col("n_cell") > max_cell)

    a = small.select("cell", F.col("id").alias("ia"), F.col("v").alias("va"))
    b = small.select("cell", F.col("id").alias("ib"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "cell")
        .where(F.col("ia") < F.col("ib"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 6) >= threshold)
        .select("cell", "ia", "ib")
    )
    # greedy keep-first by id: fold the cell's duplicate-pair list in
    # id order — ib is dropped iff its witness ia was itself kept.
    # One groupBy per cell over scalar pairs; bounded by max_cell².
    folded = pairs.groupBy("cell").agg(
        F.sort_array(F.collect_list(F.struct("ib", "ia"))).alias("ps")
    )
    dropped = folded.select(
        "cell",
        F.explode(
            F.aggregate(
                F.col("ps"),
                F.struct(
                    F.array().cast("array<long>").alias("gone"),
                    F.array()
                    .cast("array<struct<ib:long,ia:long>>")
                    .alias("out"),
                ),
                lambda acc, p: F.struct(
                    F.when(
                        ~F.array_contains(acc["gone"], p["ia"])
                        & ~F.array_contains(acc["gone"], p["ib"]),
                        F.concat(acc["gone"], F.array(p["ib"])),
                    )
                    .otherwise(acc["gone"])
                    .alias("gone"),
                    F.when(
                        ~F.array_contains(acc["gone"], p["ia"])
                        & ~F.array_contains(acc["gone"], p["ib"]),
                        F.concat(acc["out"], F.array(p)),
                    )
                    .otherwise(acc["out"])
                    .alias("out"),
                ),
                lambda acc: acc["out"],
            )
        ).alias("d"),
    ).select(
        F.col("d.ib").alias("id"), F.col("d.ia").alias("dup_of")
    )

    verdict = (
        small.select("id", "cell")
        .join(dropped, "id", "left")
        .select(
            "id",
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )
    passthrough = big.select(
        "id",
        "cell",
        F.lit(True).alias("keep"),
        F.lit(None).cast("long").alias("dup_of"),
    )
    return verdict.unionAll(passthrough).withColumnsRenamed({"id": id_col})
