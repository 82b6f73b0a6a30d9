"""Round-7 pin: simhash_expr's per-(doc, token) count-weighted bit sums
equal the per-token-row formulation they replaced — w_b arithmetic is
identical (sum of ±1 per token == sum of ±count per distinct pair)."""

from pyspark.sql import functions as F

from batch_import_spark.operators.dedup import SIMHASH_BITS, md5_token_hash, simhash_expr


def _per_token_formulation(df, text_col="text", id_col="doc_id", out_col="simhash"):
    exploded = (
        df.select(
            F.col(id_col).alias("_sid"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_tok"),
        )
        .where(F.col("_tok") != "")
    )
    hashed = exploded.select("_sid", md5_token_hash(F.col("_tok")).alias("_th"))
    h = F.col("_th")
    sums = hashed.groupBy("_sid").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_w{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = sums.select(
        "_sid",
        sum(
            [
                F.when(F.col(f"_w{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for b in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias(out_col),
    )
    return (
        df.select(F.col(id_col))
        .join(sig, F.col(id_col) == F.col("_sid"), "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col))
    )


def test_count_weighted_sums_match_per_token(spark):
    rows = [
        (1, "spark spark spark shuffle"),   # heavy in-doc repetition
        (2, "a b c d e f"),
        (3, ""),                             # empty -> signature 0
        (4, None),                           # null -> signature 0
        (5, "  mixed   CASE  Mixed case "),  # normalization + repeats
        (6, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in _per_token_formulation(df).collect())
    b = sorted(tuple(r) for r in simhash_expr(df).collect())
    assert a == b
    sigs = dict(b)
    assert sigs[3] == 0 and sigs[4] == 0
    assert sigs[1] != 0


def test_matches_on_testdata(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(tuple(r) for r in _per_token_formulation(df).collect())
    b = sorted(tuple(r) for r in simhash_expr(df).collect())
    assert a == b
