"""Fulltext-index analog (A8) + reference config parsing (G3)."""

from batch_import_spark.config import load_config
from batch_import_spark.operators.fulltext import build_fulltext_postings, fulltext_lookup


def test_fulltext_candidate_generation(spark):
    entries = spark.createDataFrame(
        [
            ("users", "name", "Mr Michael Hunger", 0),
            ("users", "name", "Michael Jackson", 1),
            ("users", "name", "Selina Kyle", 2),
        ],
        "index_name string, key_prop string, key_value string, node_id long",
    )
    postings = build_fulltext_postings(entries)
    got = {(r["token"], r["node_id"]) for r in postings.collect()}
    assert ("michael", 0) in got and ("michael", 1) in got and ("kyle", 2) in got

    queries = spark.createDataFrame(
        [(10, "michael hunger"), (11, "selina")], "query_id long, query string"
    )
    hits = fulltext_lookup(queries, postings, top_k=2)
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    # full match ranks above partial
    q10 = sorted(by_q[10], key=lambda r: r["rank"])
    assert q10[0]["node_id"] == 0 and q10[0]["score"] == 1.0
    assert q10[1]["node_id"] == 1 and q10[1]["score"] == 0.5
    assert by_q[11][0]["node_id"] == 2


def test_config_parses_reference_sample(spark):
    """ConfigTest.java:53-120 semantics on the reference's own
    sample/batch.properties."""
    with open("/root/reference/sample/batch.properties") as f:
        text = f.read()
    cfg = load_config(
        text,
        graph_db="target/graph.db",
        nodes_files="sample/nodes.csv,sample/nodes2.csv",
        rels_files="sample/rels.csv",
    )
    assert cfg.nodes_files == ["sample/nodes.csv", "sample/nodes2.csv"]
    assert cfg.rels_files == ["sample/rels.csv"]
    assert cfg.delim == "\t" and cfg.quotes is True
    assert cfg.indexes["users"].index_type == "exact"
    assert cfg.indexes["users"].element_type == "node-index"
    # mmap tuning keys accepted + ignored
    assert "neostore.nodestore.db.mapped_memory" in cfg.raw


def test_config_index_quadruples():
    cfg = load_config(
        "", index_args=["node-index", "articles", "fulltext", "idx.csv"]
    )
    ii = cfg.indexes["articles"]
    assert (ii.element_type, ii.index_type, ii.file) == (
        "node-index",
        "fulltext",
        "idx.csv",
    )
