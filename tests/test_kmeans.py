"""Exact fixed-point k-means (operators/kmeans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_import_spark.operators.kmeans import (
    cluster_balanced_sample,
    kmeans_clusters,
    kmeans_fit,
    quantize_expr,
    sqdist_expr,
)


def _vecs(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )


def test_quantize_and_sqdist(spark):
    df = spark.createDataFrame(
        [([0.1234, -0.5],), ([1.0, 2.0],)], "v array<float>"
    )
    q = df.select(quantize_expr(F.col("v")).alias("q")).collect()
    assert q[0].q == [123, -500]  # floor, not round
    assert q[1].q == [1000, 2000]
    d = (
        spark.createDataFrame([([1, 2], [4, 6])], "a array<bigint>, b array<bigint>")
        .select(sqdist_expr(F.col("a"), F.col("b")).alias("d"))
        .collect()[0]
        .d
    )
    assert d == 9 + 16


def test_two_cluster_recovery(spark):
    # two tight groups; seeds (ids 0,1) land one in each group
    pts = [[0.0, 0.0], [10.0, 10.0], [0.1, 0.1], [10.1, 9.9],
           [0.2, 0.0], [9.9, 10.1]]
    a, c = kmeans_fit(_vecs(spark, pts), k=2, iters=2)
    got = {r.vec_id: r.cid for r in a.collect()}
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1
    cent = {r.cid: r.cv for r in c.collect()}

    # expected = floor-mean of the float32-quantized coordinates
    # (9.9f is 9.8999996..., so its quantization is 9899, not 9900)
    import math

    import numpy as np

    def qz(x):
        return math.floor(float(np.float32(x)) * 1000)

    def fmean(vals):
        s = sum(vals)
        return math.floor(s / len(vals))

    assert cent[0] == [
        fmean([qz(0.0), qz(0.1), qz(0.2)]),
        fmean([qz(0.0), qz(0.1), qz(0.0)]),
    ]
    assert cent[1] == [
        fmean([qz(10.0), qz(10.1), qz(9.9)]),
        fmean([qz(10.0), qz(9.9), qz(10.1)]),
    ]


def test_empty_cluster_keeps_previous_centroid(spark):
    # duplicate seed locations: tie-break sends every point to the
    # lower cid, so cluster 1 is empty from round 1 onward
    pts = [[0.0, 0.0], [0.0, 0.0], [5.0, 5.0], [5.0, 5.0]]
    a, c = kmeans_fit(_vecs(spark, pts), k=3, iters=2)
    cent = {r.cid: r.cv for r in c.collect()}
    assert set(cent) == {0, 1, 2}
    assert cent[1] == [0, 0]  # retained, not nulled
    cids = {r.cid for r in a.collect()}
    assert cids == {0, 2}  # ties always resolve to the lower cid
    summary = {
        r.cluster_id: r.n_members
        for r in kmeans_clusters(_vecs(spark, pts), k=3, iters=2).collect()
    }
    assert summary == {0: 2, 2: 2}


def test_inertia_exact(spark):
    pts = [[0.0], [0.002], [1.0]]  # quantized: 0, 2, 1000
    summary = {
        r.cluster_id: r
        for r in kmeans_clusters(_vecs(spark, pts), k=2, iters=1).collect()
    }
    # seeds = lowest ids: c0=[0], c1=[2]; round 1 sends {2, 1000} to
    # c1 -> centroids c0=[0], c1=[floor(1002/2)]=[501]; the final
    # assignment pulls 2 back to c0 (4 < 249001)
    assert summary[0].n_members == 2
    assert summary[0].inertia_fp == 0 + 4
    assert summary[1].n_members == 1
    assert summary[1].inertia_fp == (1000 - 501) ** 2


def test_balanced_sample_cap_and_determinism(spark):
    import random

    rng = random.Random(7)
    pts = [[rng.uniform(0, 1), rng.uniform(0, 1)] for _ in range(30)] + [
        [rng.uniform(9, 10), rng.uniform(9, 10)] for _ in range(10)
    ]
    s = cluster_balanced_sample(_vecs(spark, pts), per_cluster=5, k=2, iters=2)
    rows = s.collect()
    per = {}
    for r in rows:
        per.setdefault(r.cluster_id, []).append(r.samp_rank)
    for cid, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    again = cluster_balanced_sample(
        _vecs(spark, pts), per_cluster=5, k=2, iters=2
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
