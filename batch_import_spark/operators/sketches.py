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


_HLL_P = 6                       # 2^6 = 64 registers
_HLL_M = 1 << _HLL_P
_HLL_REST_BITS = 60 - _HLL_P     # bits feeding the rank (rho)
_HLL_REST_SPACE = 1 << _HLL_REST_BITS
_HLL_RHO_CAP = 35                # cap register values so the scaled
#   harmonic sum Σ 2^(CAP−r) stays inside BIGINT with the α·m² factor;
#   identical truncation on both engines, estimator impact negligible
#   (rho > 35 needs ~2^35 distinct values per register)
_HLL_SCALE = 1 << _HLL_RHO_CAP
# α₆₄ = 0.7213/(1 + 1.079/64) ≈ 0.709, carried as the rational
# 709/1000 so the estimate is pure integer arithmetic
_HLL_ALPHA_NUM = 709 * _HLL_M * _HLL_M
_HLL_ALPHA_DEN = 1000


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate, fully reproducible
    cross-engine (unlike ``approx_count_distinct``): 64 registers from
    the portable 60-bit hash (top 6 bits → register, leading-zero
    rank of the remaining 54 → value), raw-HLL estimator in integer
    fixed point. Returns
    (group_cols..., hll_estimate long, n_registers long, register_sum long)
    — the latter two are register-state checksums so an oracle can
    verify the sketch itself, not just the estimate.

    Unlike KMV there is no distinct pre-pass and no window: two
    map-side-combinable groupBys (max per register, then one row per
    group), constant state per group — the shape that survives
    unbounded cardinality at 100 TB. No small-range (linear counting)
    correction: that needs ln(); raw HLL keeps the arithmetic exact.
    """
    # integer div/mod on the named hash column — h/2^54 via float
    # division would lose exactness past 2^53
    b = df.select(*group_cols, portable_hash60(value_col).alias("_h")).select(
        *group_cols,
        F.expr(f"_h div {_HLL_REST_SPACE}L").alias("bucket"),
        F.expr(f"_h % {_HLL_REST_SPACE}L").alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.instr(F.lpad(F.bin(F.col("rest")), _HLL_REST_BITS, "0"), "1")
    )
    ranked = b.select(
        *group_cols, "bucket", F.least(rho, F.lit(_HLL_RHO_CAP)).alias("rho")
    )
    reg = ranked.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))
    agg = reg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.expr(f"shiftleft(1L, {_HLL_RHO_CAP} - cast(r as int))")).alias("_s"),
        F.sum("r").alias("register_sum"),
    )
    est = F.expr(
        f"{_HLL_ALPHA_NUM * _HLL_SCALE}L div ({_HLL_ALPHA_DEN} * "
        f"(_s + ({_HLL_M} - n_registers) * {_HLL_SCALE}L))"
    )
    return agg.select(
        *group_cols,
        est.alias("hll_estimate"),
        F.col("n_registers").cast("long").alias("n_registers"),
        F.col("register_sum").cast("long").alias("register_sum"),
    )
