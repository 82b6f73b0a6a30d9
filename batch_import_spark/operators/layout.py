"""At-rest file layout for time-ranged access at 100 TB.

A transcript/event corpus is almost always queried by time window; a
flat parquet pile makes every such query a full scan. Writing
hive-partitioned by a date column turns time predicates into
PARTITION PRUNING — the scan never opens non-matching directories,
which at 10^12-turn scale is the difference between touching one day
and touching three years.

``write_time_partitioned`` also sorts within partitions by the given
keys so per-file min/max column statistics stay tight (row-group skip
pruning inside each day — the poor man's Z-order for one dimension).
The reference has no storage layout layer at all (it streams into
Neo4j's store files); this is the Spark-native equivalent concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: list[str] | None = None,
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet hive-partitioned by the DATE of
    ``ts_col``; optionally sort within each written partition so
    min/max stats prune row groups on ``sort_cols`` predicates."""
    out = df.withColumn(partition_col, F.to_date(F.col(ts_col)))
    if sort_cols:
        out = out.repartition(F.col(partition_col)).sortWithinPartitions(
            *sort_cols
        )
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_time_range(
    spark: SparkSession,
    path: str,
    start_date: str,
    end_date: str,
    partition_col: str = "event_date",
) -> DataFrame:
    """Read only the partitions in [start_date, end_date] — the date
    predicate lands in the scan's PartitionFilters (verify with
    ``.explain``), so non-matching directories are never opened."""
    return spark.read.parquet(path).where(
        (F.col(partition_col) >= start_date) & (F.col(partition_col) <= end_date)
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton / Z-order interleave of two non-negative integer
    columns (each truncated to its ``bits`` low bits; y takes the
    odd bit positions): the clustering key behind multi-dimensional
    data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER). Sorting
    or bucketing by this key co-locates rows that are close in BOTH
    dimensions, so per-file min/max stats prune scans filtered on
    either column — the property a single-column sort cannot give.

    Pure integer shifts/masks, one reference of each input per bit
    (linear expression tree — codegen-safe at any ``bits``), and the
    identical arithmetic replays in any SQL engine."""
    xb = F.pmod(x.cast("long"), F.lit(1 << bits))
    yb = F.pmod(y.cast("long"), F.lit(1 << bits))
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key + F.shiftleft(
            F.shiftright(xb, b).bitwiseAND(F.lit(1)), 2 * b
        ).cast("long")
        key = key + F.shiftleft(
            F.shiftright(yb, b).bitwiseAND(F.lit(1)), 2 * b + 1
        ).cast("long")
    return key
