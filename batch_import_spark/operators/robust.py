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
    # round-7 shape: ONE grouped Arrow kernel — the window formulation
    # re-derived the quantized scan four times and paid two full
    # per-group window sorts plus three joins; order statistics over
    # int64 micro-units are exact in numpy (np.sort + index ==
    # row_number asc + rank select), so medians, MAD and the outlier
    # count are bit-identical (pinned by tests/test_robust.py and the
    # mad_outliers oracle). Per-group rows must fit one Arrow batch —
    # the same single-task-per-group bound the window had.
    import numpy as np
    import pandas as pd

    v = df.select(
        *group_cols,
        F.floor(F.col(value_col) * MICRO).cast("long").alias("_v"),
    )
    out_fields = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + ["n long", "med_micro long", "mad_micro long", "n_outliers long"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["_v"].isna().any():
            raise ValueError(
                "mad_outlier_stats: NULL values unsupported — the "
                "quantized value column must be non-null"
            )
        vals = pdf["_v"].to_numpy(dtype=np.int64)
        n = len(vals)
        sv = np.sort(vals, kind="stable")
        med = int(sv[(n + 1) // 2 - 1])
        dev = np.abs(vals - med)
        sd = np.sort(dev, kind="stable")
        mad = int(sd[(n + 1) // 2 - 1])
        n_out = int((dev > k * mad).sum())
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row.update(
            {
                "n": [n],
                "med_micro": [med],
                "mad_micro": [mad],
                "n_outliers": [n_out],
            }
        )
        return pd.DataFrame(row)

    return v.groupBy(*group_cols).applyInPandas(kernel, out_fields)
