"""Ports of the reference importer test suite onto DataFrames.

Each test cites the reference case it reproduces
(src/test/java/org/neo4j/batchimport/...). The oracle pattern follows
SURVEY.md §5: instead of mock-verifying createNode/createRelationship
calls, we assert on the emitted node / edge / index-entry tables.
"""

import gzip

import pytest

from batch_import_spark.operators.graph_import import (
    import_index,
    import_nodes,
    import_relationships,
)
from batch_import_spark.sources.csv_source import read_reference_csv


def _write(path, text, encoding="utf-8"):
    path.write_text(text, encoding=encoding)
    return str(path)


def _nodes(spark, tmp_path, content, name="nodes.csv", **kw):
    return import_nodes(read_reference_csv(spark, _write(tmp_path / name, content), **kw))


# --- node import -----------------------------------------------------------


def test_import_simple_node(spark, tmp_path):
    """ImporterTest.java:58 — one node, one string property."""
    res = _nodes(spark, tmp_path, "a\tb\nfoo\tbar\n")
    rows = res.nodes.collect()
    assert len(rows) == 1
    assert rows[0]["node_id"] == 0
    assert rows[0]["a"] == "foo" and rows[0]["b"] == "bar"


def test_label_named_header_is_plain_property(spark, tmp_path):
    """AbstractLineDataTest.java:18-24: a column merely NAMED 'label'
    (no :label type) is an ordinary string property, not a label."""
    res = _nodes(spark, tmp_path, "label\nfoo\n")
    row = res.nodes.collect()[0]
    assert row["label"] == "foo" and row["labels"] is None


def test_id_typed_column_is_not_a_property(spark, tmp_path):
    """AbstractLineDataTest.java:27-34: an id:id column becomes the
    node id and is excluded from the property map."""
    res = _nodes(spark, tmp_path, "id:id\tname\n123\tbob\n")
    row = res.nodes.collect()[0]
    assert row["node_id"] == 123 and row["name"] == "bob"
    assert "id" not in res.nodes.columns


def test_to_files_filters_null_empty_missing(tmp_path):
    """ConfigTest.java:54-59 toFiles: drop '', 'null', and missing
    local paths; keep existing files and non-local URIs."""
    from batch_import_spark.config import to_files

    real = tmp_path / "nodes.csv"
    real.write_text("a\n1\n")
    got = to_files(f"null,,foo,{real}")
    assert got == [str(real)]
    assert to_files("hdfs://nn/data/x.csv,null") == ["hdfs://nn/data/x.csv"]


def test_blank_line_skipped_documented_divergence(spark, tmp_path):
    """DIVERGENCE (deliberate, documented): the reference STOPS the
    entire import at the first blank line — AbstractLineData.java:70-73
    (``processLine`` = ``parse() > 0``) with an all-null row returns 0
    and ends the ``while (data.processLine(null))`` loop
    (Importer.java:96), silently truncating the rest of the file. At
    100 TB silent truncation is a data-loss hazard, so this engine
    skips blank lines and imports everything else, keeping ids dense
    over the surviving rows."""
    res = _nodes(spark, tmp_path, "a\tb\nfoo\tbar\n\nbaz\tqux\n")
    rows = sorted(res.nodes.collect(), key=lambda r: r["node_id"])
    assert [(r["node_id"], r["a"], r["b"]) for r in rows] == [
        (0, "foo", "bar"),
        (1, "baz", "qux"),
    ]


def test_import_hashes_row_identity(spark, tmp_path):
    """ImporterTest.java:65-72 — every row creates a node, even dupes:
    row identity, not value identity."""
    h = "a" * 40
    res = _nodes(spark, tmp_path, f"a\n{h}\n{h}\n{h}\n")
    ids = sorted(r["node_id"] for r in res.nodes.collect())
    assert ids == [0, 1, 2]


def test_import_node_with_explicit_id(spark, tmp_path):
    """ImporterTest.java:75-79 — header `i:id` supplies the node id."""
    res = _nodes(spark, tmp_path, "i:id\tname\n42\tfoo\n")
    rows = res.nodes.collect()
    assert rows[0]["node_id"] == 42
    # id column is NOT a property (Type.java:6-12 isProperty=false)
    assert "i" not in res.nodes.columns
    assert rows[0]["name"] == "foo"


def test_labels_comma_split(spark, tmp_path):
    """ImporterTest.java:82-99 + Type.java:13-19 — comma-split labels
    with whitespace trim; empty cell → no labels (null)."""
    res = _nodes(spark, tmp_path, "name\tl:label\nfoo\tA, B\nbar\t\n")
    rows = {r["name"]: r for r in res.nodes.collect()}
    assert rows["foo"]["labels"] == ["A", "B"]
    assert rows["bar"]["labels"] is None


def test_utf8_properties(spark, tmp_path):
    """ImporterTest.java:108-112 — umlauts survive."""
    res = _nodes(spark, tmp_path, "name\nöäüÖÄÜß\n")
    assert res.nodes.collect()[0]["name"] == "öäüÖÄÜß"


def test_trailing_newline_ignored(spark, tmp_path):
    """ImporterTest.java:102 — a trailing blank line creates no node."""
    res = _nodes(spark, tmp_path, "a\nfoo\n\n")
    assert res.nodes.count() == 1


def test_empty_cell_is_null_property(spark, tmp_path):
    """RowDataTest.java:19-45 / AbstractLineData.java:147 — empty cell
    → no property (SQL NULL)."""
    res = _nodes(spark, tmp_path, "a\tb\tc\nfoo\t\tbaz\n")
    row = res.nodes.collect()[0]
    assert row["a"] == "foo" and row["b"] is None and row["c"] == "baz"


def test_scalar_coercion(spark, tmp_path):
    """ImporterTest.java:148-152 — typed columns, incl. 1E+10 as float."""
    res = _nodes(
        spark,
        tmp_path,
        "age:int\tweight:float\tflag:boolean\td:double\tc:char\ts:short\tb:byte\tlg:long\n"
        "25\t1E+10\tTRUE\t2.5\txyz\t7\t3\t123456789012\n",
    )
    row = res.nodes.collect()[0]
    assert row["age"] == 25
    assert row["weight"] == pytest.approx(1e10)
    assert row["flag"] is True
    assert row["d"] == 2.5
    assert row["c"] == "x"  # charAt(0)
    assert row["s"] == 7 and row["b"] == 3 and row["lg"] == 123456789012


def test_boolean_java_semantics(spark, tmp_path):
    """Type.java:20-25 Boolean.valueOf — anything not 'true' is false,
    never an error."""
    res = _nodes(spark, tmp_path, "f:boolean\nyes\n")
    assert res.nodes.collect()[0]["f"] is False


def test_conversion_failure_aborts(spark, tmp_path):
    """CsvLineDataTest.java:19-31 / readme.md:41-42 — bad typed value
    aborts the import (ANSI cast failure). The abort may surface at
    import time (dense-ID checkpoint materializes eagerly) or at the
    first downstream action — either way the bad cell never becomes a
    silent NULL."""
    with pytest.raises(Exception):
        res = _nodes(spark, tmp_path, "age:int\nnot_a_number\n")
        res.nodes.collect()


def test_array_types_default_separator(spark, tmp_path):
    """ImporterTest.java:155-164 — int_array splits on ','."""
    res = _nodes(spark, tmp_path, "xs:int_array\n1,2,3\n")
    assert res.nodes.collect()[0]["xs"] == [1, 2, 3]


def test_array_types_custom_separator(spark, tmp_path):
    """ImporterTest.java:166-175 — custom array separator '%'."""
    res = _nodes(spark, tmp_path, "xs:string_array\na%b%c\n", array_separator="%")
    assert res.nodes.collect()[0]["xs"] == ["a", "b", "c"]


def test_quoted_values_embedded_delims(spark, tmp_path):
    """CsvLineDataTest.java:109-125 — quoted cells keep embedded
    delimiters and newlines (OpenCSV semantics)."""
    res = _nodes(spark, tmp_path, 'a\tb\n"x\ty"\t"line1\nline2"\n')
    row = res.nodes.collect()[0]
    assert row["a"] == "x\ty"
    assert row["b"] == "line1\nline2"


def test_empty_cell_grid(spark, tmp_path):
    """ChunkerRowDataTest.java:18-67 — leading/trailing/missing empty
    cells all parse to NULL (no property), present cells keep their
    values, short rows are null-padded to the header width."""
    cases = [
        ("\t2\t3", (None, "2", "3")),
        ("\t2\t", (None, "2", None)),
        ("1\t\t", ("1", None, None)),
        ("1\t", ("1", None, None)),
        ("1\t2", ("1", "2", None)),
    ]
    for i, (line, expect) in enumerate(cases):
        res = _nodes(spark, tmp_path, f"a\tb\tc\n{line}\n", name=f"grid{i}.csv")
        row = res.nodes.collect()[0]
        assert (row["a"], row["b"], row["c"]) == expect, (line, row)


def test_gzip_source(spark, tmp_path):
    """Importer.java:248-250 — .gz transparently decompressed."""
    p = tmp_path / "nodes.csv.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("a\nfoo\nbar\n")
    res = import_nodes(read_reference_csv(spark, str(p)))
    assert res.nodes.count() == 2


def test_multi_file_sequential_ids(spark, tmp_path):
    """Config.java:145-154 / readme.md:38 — node ids continue across
    files in declared order."""
    p1 = _write(tmp_path / "n1.csv", "a\nr0\nr1\n")
    p2 = _write(tmp_path / "n2.csv", "a\nr2\nr3\n")
    res = import_nodes(read_reference_csv(spark, [p1, p2]))
    got = {r["a"]: r["node_id"] for r in res.nodes.collect()}
    assert got == {"r0": 0, "r1": 1, "r2": 2, "r3": 3}


def test_inline_index_population(spark, tmp_path):
    """ImporterTest.java:120-125 — indexed column emits index entries."""
    res = _nodes(spark, tmp_path, "name:string:users\tage:int\nmr andersson\t35\n")
    idx = res.index_entries.collect()
    assert len(idx) == 1
    e = idx[0]
    assert (e["index_name"], e["key_prop"], e["key_value"], e["node_id"]) == (
        "users",
        "name",
        "mr andersson",
        0,
    )


# --- relationship import ---------------------------------------------------


def _rels(spark, tmp_path, nodes_content, rels_content, **kw):
    nodes = _nodes(spark, tmp_path, nodes_content)
    ref = read_reference_csv(spark, _write(tmp_path / "rels.csv", rels_content), **kw)
    return nodes, import_relationships(ref, nodes.index_entries)


def test_rel_by_row_number_ids(spark, tmp_path):
    """readme.md:66 / ImporterTest.java:178-183 — endpoints are 0-based
    node row numbers; props typed."""
    nodes, rels = _rels(
        spark,
        tmp_path,
        "name\na\nb\nc\n",
        "start\tend\ttype\tsince\tcounter:int\n0\t1\tKNOWS\t2010\t1\n1\t2\tKNOWS\t2011\t2\n",
    )
    rows = sorted(rels.edges.collect(), key=lambda r: r["src_id"])
    assert [(r["src_id"], r["dst_id"], r["rel_type"], r["since"], r["counter"]) for r in rows] == [
        (0, 1, "KNOWS", "2010", 1),
        (1, 2, "KNOWS", "2011", 2),
    ]


def test_rel_type_from_label_column(spark, tmp_path):
    """ImporterTest.java:185-189 — a `:label`-typed column supplies the
    relationship type."""
    nodes, rels = _rels(
        spark,
        tmp_path,
        "name\na\nb\n",
        "start\tend\trt:label\n0\t1\tLIKES\n",
    )
    assert rels.edges.collect()[0]["rel_type"] == "LIKES"


def test_rel_endpoint_by_index_lookup(spark, tmp_path):
    """ImporterTest.java:128-135 — endpoints resolved through the exact
    index (entity linking)."""
    from pyspark.sql import functions as F

    nodes = _nodes(spark, tmp_path, "name:string:users\nalice\nbob\n")
    # rel endpoint headers are positional in the reference (two columns
    # may share the property name); our columnar model needs distinct
    # column names, so the fixture names them a/b and the index entries
    # are replicated per endpoint prop name.
    ref = read_reference_csv(
        spark,
        _write(tmp_path / "rels.csv", "a:string:users\tb:string:users\ttype\nalice\tbob\tKNOWS\n"),
    )
    entries_a = nodes.index_entries.withColumn("key_prop", F.lit("a"))
    entries_b = nodes.index_entries.withColumn("key_prop", F.lit("b"))
    rels = import_relationships(ref, entries_a.unionByName(entries_b))
    row = rels.edges.collect()[0]
    assert (row["src_id"], row["dst_id"], row["rel_type"]) == (0, 1, "KNOWS")


def test_rel_skip_unresolved_counted(spark, tmp_path):
    """ImporterTest.java:137-145 / Importer.java:149-152 — unresolved
    endpoint → edge skipped and counted."""
    from pyspark.sql import functions as F

    nodes = _nodes(spark, tmp_path, "name:string:users\nalice\n")
    ref = read_reference_csv(
        spark,
        _write(
            tmp_path / "rels.csv",
            "a:string:users\tb:string:users\ttype\nalice\tghost\tKNOWS\nalice\talice\tSELF\n",
        ),
    )
    entries = nodes.index_entries
    e = entries.withColumn("key_prop", F.lit("a")).unionByName(
        entries.withColumn("key_prop", F.lit("b"))
    )
    rels = import_relationships(ref, e)
    kept = rels.edges.collect()
    assert len(kept) == 1 and kept[0]["rel_type"] == "SELF"
    m = rels.observation.get
    assert m["n_input"] == 2 and m["n_resolved"] == 1 and m["n_skipped"] == 1


def test_ambiguous_index_key_skipped(spark, tmp_path):
    """LongIterableIndexHits.java:36-38 — getSingle: a key with two
    hits resolves to null → edge skipped."""
    from pyspark.sql import functions as F

    nodes = _nodes(spark, tmp_path, "name:string:users\ndup\ndup\nuniq\n")
    ref = read_reference_csv(
        spark,
        _write(tmp_path / "rels.csv", "a:string:users\tb:string:users\ttype\ndup\tuniq\tKNOWS\n"),
    )
    entries = nodes.index_entries
    e = entries.withColumn("key_prop", F.lit("a")).unionByName(
        entries.withColumn("key_prop", F.lit("b"))
    )
    rels = import_relationships(ref, e)
    assert rels.edges.count() == 0
    assert rels.observation.get["n_skipped"] == 1


# --- standalone index import ----------------------------------------------


def test_standalone_index_import(spark, tmp_path):
    """Importer.java:186-196 — index file col0 = id, rest indexed."""
    ref = read_reference_csv(
        spark, _write(tmp_path / "idx.csv", "id:id\tname:string:users\n0\talice\n1\tbob\n")
    )
    idx = import_index(ref)
    got = {(r["key_value"], r["node_id"]) for r in idx.collect()}
    assert got == {("alice", 0), ("bob", 1)}
