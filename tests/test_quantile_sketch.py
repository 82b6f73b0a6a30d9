"""Mergeable integer log-histogram quantile sketch (operators/sketches.py).

The production percentile path at 100 TB: bounded registers,
register-EXACT merges, deterministic lower-bound estimates with
relative error ≤ 2^-sub_bits.
"""

import math

from pyspark.sql import functions as F

from batch_import_spark.operators.sketches import (
    QUANTILE_SUB_BITS,
    merge_quantile_sketches,
    quantile_sketch,
    quantile_sketch_query,
)


def _vals(spark, seed=11, n=4000):
    # heavy-tailed deterministic values across several orders of magnitude
    return spark.range(n).select(
        (F.col("id") % 3).alias("g"),
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) + 1
        ).alias("v"),
    )


def test_merge_is_register_exact(spark):
    df = _vals(spark)
    whole = quantile_sketch(df, ["g"], "v")
    a = quantile_sketch(df.where(F.col("id") % 2 == 0), ["g"], "v")
    b = quantile_sketch(df.where(F.col("id") % 2 == 1), ["g"], "v")
    merged = merge_quantile_sketches(a, b, ["g"])
    rows_w = sorted(map(tuple, whole.collect()))
    rows_m = sorted(map(tuple, merged.collect()))
    assert rows_w == rows_m  # not approximately — register identical


def test_bounded_state(spark):
    df = _vals(spark, n=20000)
    sk = quantile_sketch(df, ["g"], "v")
    per_group = {r["g"]: r["c"] for r in
                 sk.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    cap = (64 - QUANTILE_SUB_BITS) * (1 << QUANTILE_SUB_BITS) + (1 << QUANTILE_SUB_BITS)
    assert all(c <= cap for c in per_group.values())
    # 20k values collapse into ≪ distinct-value many registers
    assert all(c < 400 for c in per_group.values())


def test_quantile_error_bound(spark):
    df = _vals(spark)
    sk = quantile_sketch(df, ["g"], "v")
    got = {
        (r["g"], r["q_pct"]): r["est"]
        for r in quantile_sketch_query(sk, ["g"], [50, 90, 99]).collect()
    }
    pdf = df.toPandas()
    rel = 2.0 ** -QUANTILE_SUB_BITS
    for g, sub in pdf.groupby("g"):
        vs = sorted(sub["v"])
        for q in (50, 90, 99):
            true_q = vs[math.ceil(q * len(vs) / 100) - 1]
            est = got[(g, q)]
            # est is the bucket lower bound containing the rank element
            assert est <= true_q < est * (1 + rel) + 1, (g, q, est, true_q)


def test_small_values_exact(spark):
    df = spark.range(100).select(
        F.lit(0).alias("g"), (F.col("id") % 15).alias("v")  # all < 2^sub_bits
    )
    sk = quantile_sketch(df, ["g"], "v")
    got = {r["q_pct"]: r["est"]
           for r in quantile_sketch_query(sk, ["g"], [50, 99]).collect()}
    vs = sorted(range(100), key=lambda i: i % 15)
    vs = sorted(i % 15 for i in range(100))
    assert got[50] == vs[math.ceil(50 * 100 / 100) - 1]
    assert got[99] == vs[math.ceil(99 * 100 / 100) - 1]


def test_powers_of_two_bucket_exactly(spark):
    """Boundary correctness of the libm-corrected exponent: 2^k and
    2^k − 1 land in adjacent buckets for every k."""
    rows = [(1 << k) for k in range(4, 40)] + [(1 << k) - 1 for k in range(5, 40)]
    df = spark.createDataFrame([(v,) for v in rows], "v long").select(
        F.lit(0).alias("g"), "v"
    )
    sk = quantile_sketch(df, ["g"], "v").collect()
    buckets = {}
    for r in sk:
        buckets.setdefault(r["bucket"], 0)
        buckets[r["bucket"]] += r["cnt"]
    s = QUANTILE_SUB_BITS
    for k in range(5, 40):
        b_pow = (k << s)  # 2^k → e=k, m=0
        b_below = ((k - 1) << s) + (1 << s) - 1  # 2^k−1 → e=k−1, m=2^s−1
        assert b_pow in buckets, k
        assert b_below in buckets, k
