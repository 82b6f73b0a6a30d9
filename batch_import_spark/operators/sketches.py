"""Distinct-count sketch: KMV (k-minimum-values).

The contract's operator list names "a novel sketch" alongside the
dedup/similarity family. Spark's built-in HLL
(``approx_count_distinct``) is the production path — map-side
combinable, constant state — but its estimate is not reproducible
outside Spark, so it can't be oracle-checked cross-engine. KMV is:
hash every value with a PORTABLE hash (md5-derived 60-bit integer,
computable in any SQL engine), keep the k smallest distinct hashes
per group, and estimate

    distinct ≈ (k-1) * 2^60 / kth_smallest_hash

(exact count when a group has fewer than k distinct hashes — the
standard KMV small-set rule). Every step is deterministic, so the
DuckDB oracle reproduces the estimate bit-for-bit.

Scale notes: the distinct pass and the per-group top-k window shuffle
only (group, hash) pairs — state bounded by distinct values, and the
window is rank-limited (WindowGroupLimit pushes the k cut below the
exchange). For unbounded-cardinality production use prefer the HLL
built-in; this operator exists where reproducibility matters more
than constant memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = float(1 << 60)


def portable_hash60(col: Column | str) -> Column:
    """60-bit integer hash computable identically in any engine:
    first 15 hex chars of md5 of the value's string form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns (group_cols..., kmv_estimate long, n_kept int).
    """
    d = df.select(*group_cols, portable_hash60(value_col).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    ranked = d.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_r") == k, F.col("_h"))).alias("_kth"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("n_kept").cast("long")
    ).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_kth").cast("double"))
    )
    return agg.select(*group_cols, est.alias("kmv_estimate"), "n_kept")
