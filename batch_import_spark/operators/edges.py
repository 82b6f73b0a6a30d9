"""Edge-list normalization & ordering (reference RelationshipSorter).

The reference externally sorts the relationship file by
(min(start,end), max(start,end), lineNo) for import locality
(RelationshipSorter.java:18-39, FileIterator.java:76-98,
RelStartEndComparatorTest.java:17-31). On Spark the external sort is
built-in; we keep the *semantics*: canonical undirected key +
line-number tiebreak that preserves duplicate edges.

``cluster_edges`` is the scale-relevant variant: repartitionByRange on
the canonical key co-locates edges of the same neighborhood, the
Spark analog of the reference's locality sort for parallel import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame,
    src: str = "start",
    dst: str = "end",
    line_no: str = "line_no",
) -> DataFrame:
    """Add canonical (edge_min, edge_max) and sort like the reference."""
    out = edges.withColumn("edge_min", F.least(src, dst)).withColumn(
        "edge_max", F.greatest(src, dst)
    )
    return out.sort("edge_min", "edge_max", line_no)


def cluster_edges(edges: DataFrame, src: str = "start", dst: str = "end",
                  num_partitions: int | None = None) -> DataFrame:
    """Range-cluster edges by canonical key for locality at scale."""
    out = edges.withColumn("edge_min", F.least(src, dst)).withColumn(
        "edge_max", F.greatest(src, dst)
    )
    parts = [num_partitions] if num_partitions else []
    return out.repartitionByRange(*parts, "edge_min", "edge_max").sortWithinPartitions(
        "edge_min", "edge_max"
    )
