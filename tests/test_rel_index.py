"""Relationship IDs + relationship-side index population (round-3).

Reference semantics: db.createRelationship returns the next sequential
relationship id (Importer.java:154) — only created (non-skipped) rels
consume ids — and indexed rel-file property columns then populate the
named relationship index under that id (Importer.java:155-157 via
AbstractLineData.getIndexData:92-106). Standalone quadruples with
elementType relationship-index import via Importer.importIndex with
column 0 = the rel id (Importer.java:186-196).
"""

from pyspark.sql import functions as F

from batch_import_spark.operators.graph_import import (
    import_nodes,
    import_relationships,
)
from batch_import_spark.sources.csv_source import read_reference_csv


def _write(path, text):
    path.write_text(text, encoding="utf-8")
    return str(path)


def test_rel_ids_dense_creation_order(spark, tmp_path):
    """Rel ids are 0-based in input order over surviving rows only —
    a skipped rel never reaches createRelationship, so it consumes no
    id (Importer.java:147-154)."""
    nodes = import_nodes(
        read_reference_csv(spark, _write(tmp_path / "n.csv", "name:string:users\na\nb\n"))
    )
    e = nodes.index_entries
    entries = e.withColumn("key_prop", F.lit("s")).unionByName(
        e.withColumn("key_prop", F.lit("t"))
    )
    rels = import_relationships(
        read_reference_csv(
            spark,
            _write(
                tmp_path / "r.csv",
                "s:string:users\tt:string:users\ttype\n"
                "a\tb\tFIRST\n"
                "a\tghost\tSKIPPED\n"  # unresolved → no id consumed
                "b\ta\tSECOND\n",
            ),
        ),
        entries,
    )
    rows = sorted(rels.edges.collect(), key=lambda r: r["rel_id"])
    assert [(r["rel_id"], r["rel_type"]) for r in rows] == [(0, "FIRST"), (1, "SECOND")]
    m = rels.observation.get
    assert m["n_input"] == 3 and m["n_resolved"] == 2 and m["n_skipped"] == 1


def test_rel_inline_index_population(spark, tmp_path):
    """Importer.java:155-157 — indexed rel property columns (offset>=3)
    emit (index_name, key_prop, key_value, rel_id); null cells add no
    entry (AbstractLineData.getIndexData skips null values)."""
    nodes = import_nodes(
        read_reference_csv(spark, _write(tmp_path / "n.csv", "name\na\nb\nc\n"))
    )
    rels = import_relationships(
        read_reference_csv(
            spark,
            _write(
                tmp_path / "r.csv",
                "start\tend\ttype\tsince:string:relidx\tweight:int\n"
                "0\t1\tKNOWS\t2010\t1\n"
                "1\t2\tKNOWS\t\t2\n"  # empty since → no index entry
                "2\t0\tKNOWS\t2012\t3\n",
            ),
        ),
        nodes.index_entries,
    )
    idx = sorted(rels.index_entries.collect(), key=lambda r: r["rel_id"])
    assert [(r["index_name"], r["key_prop"], r["key_value"], r["rel_id"]) for r in idx] == [
        ("relidx", "since", "2010", 0),
        ("relidx", "since", "2012", 2),
    ]
    # un-indexed property columns add nothing
    assert rels.index_entries.where(F.col("key_prop") == "weight").count() == 0


def test_cli_rels_only_import(spark, tmp_path, capsys):
    """Importer.doImport skips an absent nodes stage and still imports
    relationships (endpoints here are literal node ids)."""
    from batch_import_spark.__main__ import main

    rels = _write(tmp_path / "r.csv", "start\tend\ttype\n0\t1\tKNOWS\n1\t0\tKNOWS\n")
    out = tmp_path / "graph_rels_only"
    rc = main(["import-csv", "--rels", rels, "--out", str(out)])
    assert rc == 0
    edges = spark.read.parquet(str(out / "edges"))
    assert edges.count() == 2
    assert sorted(r["rel_id"] for r in edges.collect()) == [0, 1]


def test_cli_standalone_relationship_index(spark, tmp_path):
    """A relationship-index quadruple imports into rel_index_entries
    with column 0 as the rel id (Importer.java:186-196)."""
    from batch_import_spark.__main__ import main

    nodes = _write(tmp_path / "n.csv", "name\na\nb\n")
    rels = _write(
        tmp_path / "r.csv",
        "start\tend\ttype\tsince:string:relidx\n0\t1\tKNOWS\t2010\n",
    )
    quad_file = _write(
        tmp_path / "ri.csv", "id\tlabel:string:relidx2\n0\tbest-friend\n"
    )
    out = tmp_path / "graph_relidx"
    rc = main(
        [
            "legacy", str(out), nodes, rels,
            "relationship-index", "relidx2", "exact", quad_file,
        ]
    )
    assert rc == 0
    ri = spark.read.parquet(str(out / "rel_index_entries"))
    rows = sorted(ri.collect(), key=lambda r: r["index_name"])
    assert [(r["index_name"], r["key_prop"], r["key_value"], r["rel_id"]) for r in rows] == [
        ("relidx", "since", "2010", 0),
        ("relidx2", "label", "best-friend", 0),
    ]
