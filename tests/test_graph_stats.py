"""Triangle counting (operators/graph_stats.py) — hand-computed oracle."""

from batch_import_spark.operators.graph_stats import triangle_counts, undirected_edges


def test_undirected_canonicalization(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3), (2, 3)], "src long, dst long"
    )
    got = {(r["u"], r["v"]) for r in undirected_edges(e).collect()}
    assert got == {(1, 2), (2, 3)}  # reversed dup collapsed, self-loop dropped


def test_triangle_counts_hand_graph(spark):
    """K4 on {1..4} (4 triangles, each node in 3), a pendant node 5,
    a separate triangle {6,7,8}, plus noise duplicates/reversals."""
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (5, 1),                                           # pendant
        (6, 7), (7, 8), (8, 6),                           # triangle
        (2, 1), (4, 3), (6, 6),                           # noise
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}
