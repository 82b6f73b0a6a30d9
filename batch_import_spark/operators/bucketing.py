"""Bucketed table layout for co-located, shuffle-free joins.

At 100 TB the recurring joins of this engine — edge endpoints against
the node-id dictionary, index entries against entities, triples
against triples for evaluation — all key on an id column. Writing
both sides bucketed (hash-clustered AND sorted) by that key lets
every subsequent equi-join run with ZERO exchange: Spark's
FileSourceScanExec exposes the bucket hash-partitioning as the
output partitioning, Catalyst sees both sides already distributed on
the join key, and the SortMergeJoin's sort is satisfied by the
bucket sort order. The shuffle is paid once at write time, amortized
over every downstream join/groupBy on that key.

This is the Spark-native analog of the reference's MapDB id cache:
instead of caching lookups in one process's memory
(BatchInserterIndex, Importer.java:129-136), the lookup side is laid
out so the cluster never moves it again.

Iceberg note: the same layout is ``bucket(n, col)`` partition
transforms + storage-partitioned joins; this module uses the
Spark-session catalog's bucketed tables, which need no extra jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table in
    the session catalog. Joins between tables bucketed the same way on
    the same key count need no exchange (and no sort when ``sort``)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key.

    Plain ``join`` — the point is what Catalyst does with it: with
    both scans reporting the same bucket partitioning, the plan has no
    Exchange under the join (tests assert this on the physical plan).
    The ``merge`` hint is applied UNCONDITIONALLY to both sides: a
    broadcast join would hide the exchange-free property this function
    exists to provide (and to let tests assert), so even a
    would-be-broadcast small side goes through the zero-exchange
    sort-merge path. Callers who prefer broadcast for a small side
    should just ``join`` the tables directly.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right.hint("merge"), on, how)
