"""Canonicalization: connected components over an equivalence edge list.

The reference's value-level identity convention is "two rows that
resolve to the same indexed key get the same node id"
(Importer.java:129-132); its edge-normalization sort key
min(start,end)/max(start,end) (FileIterator.java:88-98) is the
one-step version of what we make transitive here: the alternating
**large-star / small-star** connected-components algorithm of Kiveris
et al. (MapReduce and Beyond), expressed as DataFrame joins/aggs so
Catalyst/AQE handle shuffle and skew.

Determinism: component id = min node id in the component — an
order-free election, identical at any parallelism (SURVEY.md §7.3).
Lineage is cut with ``localCheckpoint`` every iteration so long runs
do not blow the plan up.

Scale notes: both stars are groupBy-min + join — no collect_list, so
hub nodes cost a shuffle but never a single-task materialization; AQE
skew-join splitting covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of u to min(Γ⁺(u))."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's ≤-neighborhood, attach everything to the min."""
    # orient every edge (hi, lo)
    o = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    j = o.join(m, "u")
    to_min = j.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = m.select("u", F.col("m").alias("v"))
    return to_min.union(self_edge).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (node_id, component_id) with component_id = min id.

    ``edges``: long-typed undirected edge list; isolated nodes absent
    from it map to themselves (callers union identity if needed).
    Convergence: edge multiset fingerprint (count + hash-sum) stable
    across a large+small round.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    ).distinct()
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iterations} iterations")

    # converged: every edge is (node, component-min); roots map to themselves
    members = e.select(F.col("u").alias("node_id"), F.col("v").alias("component_id"))
    roots = e.select(F.col("v").alias("node_id")).distinct().withColumn(
        "component_id", F.col("node_id")
    )
    return members.union(roots).distinct()


def canonical_mapping(nodes_with_keys: DataFrame, node_col: str, key_col: str) -> DataFrame:
    """CC over 'same key ⇒ same canonical node' equivalence.

    Builds star edges node↔min-node-per-key (not all pairs — linear,
    not quadratic, in group size) and returns
    (node, canonical) covering every input node.
    """
    mins = nodes_with_keys.groupBy(key_col).agg(F.min(node_col).alias("_min_node"))
    star = (
        nodes_with_keys.join(mins, key_col)
        .select(F.col(node_col).alias("u"), F.col("_min_node").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    cc = connected_components(star)
    all_nodes = nodes_with_keys.select(F.col(node_col).alias("node_id")).distinct()
    return (
        all_nodes.join(cc, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("component_id", "node_id").alias("canonical_id"),
        )
    )
