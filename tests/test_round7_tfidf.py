"""Round-7 pin: tfidf_top_terms with the shared (checkpointed) tf table
and explode+Filter tokenization equals the round-6 formulation
(array-lambda filter, tf computed separately for df and the probe)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_import_spark.operators.fulltext import tfidf_top_terms


def _r6_formulation(docs, text_col="text", id_col="doc_id", k=3):
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(dfreq), "token").withColumn(
        "score_u", F.expr(f"tf * ({n_docs * 1000000}L DIV df)")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_u").desc(), F.col("token").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("doc_id", "token", "tf", "df", "score_u")
    )


def test_tfidf_matches_r6_formulation(spark):
    rows = [
        (1, "spark spark shuffle join"),
        (2, "  leading and   trailing   "),
        (3, ""),          # no tokens
        (4, None),        # null text
        (5, "unique-token spark"),
        (6, "a a a a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 3):
        a = sorted(tuple(r) for r in _r6_formulation(docs, k=k).collect())
        b = sorted(tuple(r) for r in tfidf_top_terms(docs, k=k).collect())
        assert a == b
        assert len(b) > 0


def test_tfidf_matches_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(tuple(r) for r in _r6_formulation(docs).collect())
    b = sorted(tuple(r) for r in tfidf_top_terms(docs, k=3).collect())
    assert a == b
