"""Bucketed-layout co-located joins: the physical plan must contain
no Exchange (shuffle) under the join when both sides share the bucket
spec — the write-once/join-free layout the KG id-dictionary uses at
scale (operators/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from batch_import_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    nodes = spark.range(1000).select(
        F.col("id").alias("node_id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    edges = spark.range(5000).select(
        (F.col("id") % 1000).alias("node_id"), (F.col("id") % 37).alias("w")
    )
    write_bucketed(nodes, "t_nodes_b", ["node_id"], n_buckets=8)
    write_bucketed(edges, "t_edges_b", ["node_id"], n_buckets=8)
    yield "t_nodes_b", "t_edges_b"
    spark.sql("DROP TABLE IF EXISTS t_nodes_b")
    spark.sql("DROP TABLE IF EXISTS t_edges_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, rt, lt, on=["node_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it computes the right thing
    assert j.count() == 5000
    row = j.groupBy().agg(F.sum("w").alias("s")).collect()[0]
    assert row["s"] == sum((i % 37) for i in range(5000))


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join without the bucketed layout shuffles."""
    lt, _ = bucketed_tables
    plain = spark.range(5000).select((F.col("id") % 1000).alias("node_id"))
    j = plain.hint("merge").join(spark.table(lt).hint("merge"), "node_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
