"""Robust per-group outlier statistics: median / MAD in exact integers.

Mean/stddev outlier screens break on the heavy-tailed value
distributions data pipelines actually see (one bad sensor shifts the
mean it is judged against). The robust pair — median and MAD (median
absolute deviation) — has a 50% breakdown point. Everything here is
EXACT integer order statistics on micro-unit values (floor(v * 1e6)
as BIGINT, the decimal-tie floor transform): the LOWER median (order
statistic at floor((n+1)/2)), never interpolation, so any engine
reproduces every byte and the classic |x - med| > k·MAD rule is pure
BIGINT comparison.

Plan shape: two rank-window passes over (group, value) — each a
single shuffle on the group key with WindowGroupLimit-free full sort
per group. Exact medians need the per-group sort by definition; at
100 TB grain use the mergeable log-histogram quantile sketch
(sketches.py quantile_sketch) and accept its 2^-s relative error —
this operator is the exact-grain audit tool.

Reference analog: none (the reference has no aggregate functions at
all) — brief-side data-quality surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _lower_median(df: DataFrame, group_cols: list[str], col: str, out: str) -> DataFrame:
    """Exact lower median per group: the floor((n+1)/2)-th order
    statistic (ties broken by value order — deterministic)."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(col).asc())
    ranked = df.withColumn("_rn", F.row_number().over(w))
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(counts, group_cols)
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        .select(*group_cols, F.col(col).alias(out))
    )


def mad_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Per group: n, median, MAD, and the count of k·MAD outliers —
    all in integer micro-units. MAD = 0 (constant-majority group)
    flags any deviation as an outlier, which is the conventional
    degenerate-case reading."""
    v = df.select(
        *group_cols,
        F.floor(F.col(value_col) * MICRO).cast("long").alias("_v"),
    )
    med = _lower_median(v, group_cols, "_v", "med_micro")
    dev = v.join(med, group_cols).select(
        *group_cols,
        "_v",
        "med_micro",
        F.abs(F.col("_v") - F.col("med_micro")).alias("_dev"),
    )
    mad = _lower_median(
        dev.select(*group_cols, "_dev"), group_cols, "_dev", "mad_micro"
    )
    joined = dev.join(mad, group_cols)
    return joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("med_micro").cast("long").alias("med_micro"),
        F.min("mad_micro").cast("long").alias("mad_micro"),
        F.sum(
            (F.col("_dev") > F.lit(k) * F.col("mad_micro")).cast("long")
        ).cast("long").alias("n_outliers"),
    )
