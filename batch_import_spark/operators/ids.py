"""Node-ID assignment.

The reference assigns dense, 0-based, insertion-order node IDs
(Importer.java:103, readme.md:38) — inherently sequential. Two Spark
strategies (SURVEY.md §1.3, §4):

- ``stable_id``: xxhash64 of the canonical key — order-free, shuffle-
  free, the default at scale;
- ``with_dense_id``: dense 0-based IDs under a stable total order,
  without a single-partition global window: repartitionByRange on the
  order key (ascending ranges land in ascending partition ids), local
  row_number per partition, plus driver-side cumulative partition
  offsets (one tiny count job). Used where reference-parity requires
  true row numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stable_id(*cols: Column | str, seed: int = 0) -> Column:
    """Deterministic 64-bit ID from the canonical key columns."""
    return F.xxhash64(F.lit(seed), *[F.col(c) if isinstance(c, str) else c for c in cols])


def with_dense_id(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "node_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based IDs in ``order_cols`` order, scalably.

    Plan shape: range shuffle → checkpoint (pins the sampled range
    boundaries so the counts job and the row-number job can't diverge)
    → per-partition window → broadcast join of ~num_partitions offsets.
    No stage ever holds more than one partition's rows.
    """
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    # Materialize the partitioning ONCE: repartitionByRange samples
    # with a per-execution seed (and AQE may re-coalesce), so running
    # the counts job and the row-number job from the same lazy plan can
    # see DIFFERENT partition assignments → duplicate/skipped IDs.
    # After this checkpoint both jobs read the identical partitioning.
    ranged = ranged.localCheckpoint(eager=True)

    # tiny: one row per partition
    counts = (
        ranged.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    odf = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )

    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (
        ranged.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(odf), "_pid")
        .withColumn(id_col, F.col("_offset") + F.col("_rn"))
        .drop("_pid", "_rn", "_offset")
    )
    return out
