"""Ports of RelationshipSorterTest / RelStartEndComparatorTest.

RelationshipSorterTest.java:21-54 asserts (a) output row count equals
input, (b) output is sorted by (min(start,end), max(start,end),
lineNo); RelStartEndComparatorTest.java:17-31 pins the comparator.
"""

from pyspark.sql import functions as F

from batch_import_spark.operators.edges import cluster_edges, normalize_edges


def _edges(spark):
    rows = [
        (5, 1, 0),
        (1, 5, 1),  # duplicate undirected edge, kept via line_no tiebreak
        (2, 9, 2),
        (9, 2, 3),
        (3, 3, 4),
        (0, 7, 5),
    ]
    return spark.createDataFrame(rows, "start long, end long, line_no long")


def test_normalize_edges_sorted_and_complete(spark):
    df = _edges(spark)
    out = normalize_edges(df).collect()
    # count invariant (RelationshipSorterTest: same number of lines)
    assert len(out) == df.count()
    keys = [(r["edge_min"], r["edge_max"], r["line_no"]) for r in out]
    assert keys == sorted(keys)
    # canonical undirected key (RelStartEndComparator semantics)
    assert keys[0][:2] == (0, 7) or keys[0][:2] == (1, 5)
    for r in out:
        assert r["edge_min"] == min(r["start"], r["end"])
        assert r["edge_max"] == max(r["start"], r["end"])


def test_cluster_edges_locality(spark):
    df = _edges(spark)
    out = cluster_edges(df, num_partitions=2)
    # all rows survive; within each partition rows are key-sorted
    rows = out.withColumn("pid", F.spark_partition_id()).collect()
    assert len(rows) == 6
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append((r["edge_min"], r["edge_max"]))
    for ks in by_pid.values():
        assert ks == sorted(ks)
