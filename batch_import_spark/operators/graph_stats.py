"""Distributed graph statistics over DataFrame edge lists.

Companions to operators/canonicalize.py (connected components) for the
KG-analytics surface: triangle counting here, degree stats in the
driver contract. The reference has no analytics layer (its graph ends
at the BatchInserter); these operators serve the downstream QA that a
KG construction pipeline needs (clustering coefficients, community
seeds, link-error smells such as triangle-free hub nodes).

Triangle counting uses the degree-orientation formulation (the
standard MapReduce/Spark shape, cf. Suri & Vassilvitskii, "Counting
Triangles and the Curse of the Last Reducer", WWW'11): orient every
undirected edge from its lower-(degree, id) endpoint to the higher
one, generate wedges only at each edge's LOW endpoint, and close them
against the oriented edge set. A node of degree d generates
O(min(d, √m)²) wedges instead of O(d²) — the hub node that would melt
a naive formulation generates almost none, because nearly all its
edges point INTO it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(df: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected simple edge set: (u < v), self-loops
    dropped, duplicates collapsed."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return df.select(u, v).where(F.col("u") != F.col("v")).distinct()


def triangle_counts(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts: (node, n_triangles),
    nodes in at least one triangle.

    Plan: degrees (map-side combinable groupBy) → broadcast-joined
    orientation (the degree table has one SMALL row per node — still
    a shuffle join at web scale, on an evenly-hashed key) → one
    self-join to build wedges at low endpoints → one equi-join to
    close them. Every join key is (node, node) pairs or single node
    ids — no key is hotter than the max ORIENTED out-degree, which
    orientation bounds by ~√(2m).
    """
    e = undirected_edges(df, src, dst)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: a → b iff (deg(a), a) < (deg(b), b); total order, so the
    # oriented graph is acyclic and every triangle is counted exactly
    # once as wedge (a→b, a→c) + closing edge (b→c) with b before c
    with_deg = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    hi_ord = F.when(
        lo_first, F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    ).otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("n")))
    oriented = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        hi_ord.alias("_ord_b"),
    )
    # wedges at the low endpoint; order the two outs by the SAME total
    # order used for orientation so the closing edge (b→c) exists in
    # the oriented set iff the wedge is a triangle
    o1 = oriented.select("a", F.col("b").alias("w1"), F.col("_ord_b").alias("o1"))
    o2 = oriented.select(F.col("a").alias("a2"), F.col("b").alias("w2"), F.col("_ord_b").alias("o2"))
    wedges = (
        o1.join(o2, (o1.a == o2.a2) & (F.col("o1") < F.col("o2")))
        .select("a", F.col("w1").alias("b"), F.col("w2").alias("c"))
    )
    closing = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
