"""Round-7 pin: connected_components' driver-side union-find fast path
(edge sets <= driver_threshold) returns exactly the distributed
large/small-star loop's output."""

import random

from pyspark.sql import functions as F

from batch_import_spark.operators.canonicalize import connected_components


def _both(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    fast = sorted(tuple(r) for r in connected_components(df).collect())
    dist = sorted(
        tuple(r) for r in connected_components(df, driver_threshold=0).collect()
    )
    return fast, dist


def test_matches_distributed_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 30 * trial)
        ]
        fast, dist = _both(spark, edges)
        assert fast == dist
        assert len(fast) > 0


def test_matches_on_chains_selfloops_and_duplicates(spark):
    edges = (
        [(i, i + 1) for i in range(10)]        # one chain
        + [(20, 21), (21, 20), (20, 21)]       # duplicates both ways
        + [(30, 30)]                           # self-loop only: excluded
        + [(40, 41)]
    )
    fast, dist = _both(spark, edges)
    assert fast == dist
    nodes = {n for n, _ in fast}
    assert 30 not in nodes                      # self-loop-only node absent
    comp = dict(fast)
    assert all(comp[i] == 0 for i in range(11))  # chain collapses to min 0


def test_empty_edge_set(spark):
    fast, dist = _both(spark, [(1, 1)])  # only a self-loop -> empty
    assert fast == dist == []
