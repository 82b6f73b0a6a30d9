"""Round-7 pin: cooccurrence_lift's positional pair generator (sorted
distinct-token array, j > i) emits exactly the pair multiset of the
round-6 doc-keyed self-join it replaced."""

from pyspark.sql import functions as F

from batch_import_spark.operators.cooccur import cooccurrence_lift


def _join_formulation(docs, text_col="text", id_col="doc_id", min_count=2, max_doc_terms=200):
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    )
    per_doc = docs.select(F.col(id_col).alias("doc"), toks.alias("ts")).where(
        F.size("ts").between(1, max_doc_terms)
    )
    n_docs = per_doc.count()
    term = per_doc.select("doc", F.explode("ts").alias("t"))
    n_term = term.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a = term.select("doc", F.col("t").alias("term_a"))
    b = term.select(F.col("doc").alias("doc_b"), F.col("t").alias("term_b"))
    pairs = (
        a.join(b, (a["doc"] == b["doc_b"]) & (a["term_a"] < b["term_b"]))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    return (
        pairs.join(n_term.select(F.col("t").alias("term_a"), F.col("n").alias("n_a")), "term_a")
        .join(n_term.select(F.col("t").alias("term_b"), F.col("n").alias("n_b")), "term_b")
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                f"CAST(n_ab AS DECIMAL(38,0)) * {n_docs} * 1000000"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            ).alias("lift_ppm"),
        )
    )


def test_positional_pairs_match_join(spark):
    rows = [
        (1, "a b c d"),
        (2, "b a"),            # unsorted input order
        (3, "c c c b"),        # in-doc repeats collapse (array_distinct)
        (4, None),             # null text drops out
        (5, "z"),              # single token: no pairs, counts toward N
        (6, "  a   b  "),      # whitespace runs
        (7, "d c b a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for mc in (1, 2):
        a = sorted(tuple(r) for r in _join_formulation(docs, min_count=mc).collect())
        b = sorted(tuple(r) for r in cooccurrence_lift(docs, min_count=mc).collect())
        assert a == b
        assert len(b) > 0


def test_max_doc_terms_guard_matches(spark):
    long_doc = " ".join(f"t{i:03d}" for i in range(250))  # over the cap
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, long_doc)], "doc_id long, text string"
    )
    a = sorted(tuple(r) for r in _join_formulation(docs, min_count=1).collect())
    b = sorted(tuple(r) for r in cooccurrence_lift(docs, min_count=1).collect())
    assert a == b
    # the capped doc contributes neither pairs nor N: lift for (a,b)
    # is n_ab(2) * N(2) * 1e6 / (n_a(2) * n_b(2)) = 1e6
    lifts = {(ta, tb): lift for ta, tb, n_ab, n_a, n_b, lift in b}
    assert lifts[("a", "b")] == 1_000_000
