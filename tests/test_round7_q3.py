"""Round-7 pin: q3_revenue_topk's integer micro-unit aggregation is
value- and schema-identical to the decimal(18,4)/(38,8) formulation it
replaced, including half-up rounding edges (x.xx5 at scale 8)."""

from pyspark.sql import functions as F


def _decimal_formulation(c, o, li):
    d4 = lambda c_: F.col(c_).cast("decimal(18,4)")  # noqa: E731
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(d4("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - d4("l_discount"))),
                2,
            )
            .cast("decimal(18,2)")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _u4_formulation(c, o, li):
    u4 = lambda c_: F.expr(f"CAST(CAST({c_} AS DECIMAL(18,4)) * 10000 AS BIGINT)")  # noqa: E731
    prod = u4("l_extendedprice") * (F.lit(10000).cast("long") - u4("l_discount"))
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(prod).alias("_s8"))
        .select(
            "o_orderkey",
            F.expr(
                "CAST(CAST((_s8 + 500000) DIV 1000000 AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))"
            ).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def test_u4_formulation_matches_decimal(spark):
    # prices engineered to hit the rounding boundary: products at scale 8
    # ending in ...5 (e.g. 0.0625 * 0.9 = 0.05625 -> u8 5625000), plus
    # plain money values and a zero-discount row
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            (10, 0.0625, 0.9),       # product .05625 -> rounds half-up at scale 2 chain
            (10, 1234.56, 0.04),
            (11, 99999.9999, 0.0001),
            (11, 0.005, 0.5),        # .0025 -> u8 250000 -> (s+5e5) DIV 1e6 boundary
            (12, 50000.0, 0.0),
            (13, 7.77, 0.07),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    a = [tuple(r) for r in _decimal_formulation(cust, orders, li).collect()]
    b = [tuple(r) for r in _u4_formulation(cust, orders, li).collect()]
    assert a == b
    assert _decimal_formulation(cust, orders, li).schema == _u4_formulation(cust, orders, li).schema


def test_u4_formulation_matches_on_testdata(spark):
    sf = "/root/testdata/sf0.01"
    c = spark.read.parquet(f"{sf}/customer.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    a = [tuple(r) for r in _decimal_formulation(c, o, li).collect()]
    b = [tuple(r) for r in _u4_formulation(c, o, li).collect()]
    assert a == b and len(a) == 10
