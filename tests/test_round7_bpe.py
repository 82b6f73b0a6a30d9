"""Round-7 pin: bpe_doc_stats (Arrow, distinct-word cache) must be
bit-identical to the replace-chain expression path for counts AND
segmentation hashes, including NULL / empty / whitespace-edge docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_import_spark.functions.bpe import (
    bpe_doc_stats,
    bpe_train,
    encode_text,
    segment_expr,
    token_count_expr,
)
from batch_import_spark.operators.sketches import portable_hash60

DOCS = [
    (0, None),
    (1, ""),
    (2, " "),
    (3, "\t\n"),
    (4, "aaa aab abab banana bandana"),
    (5, "the cat sat on the mat " * 10),
    (6, "  leading and trailing  "),
    (7, "\tTabs\tbecome  spaces\n"),
    (8, "unicode ééé banana"),
    (9, "a"),
]


def test_bpe_doc_stats_matches_expression_path(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    merges3 = bpe_train(df, "text", n_merges=12, min_pair_count=2)
    merges = [(l, r) for (l, r, _) in merges3]
    enc = encode_text("text", merges)
    want = {
        r.doc_id: (r.n, r.h)
        for r in df.select(
            "doc_id",
            token_count_expr(enc).alias("n"),
            portable_hash60(segment_expr(enc)).alias("h"),
        ).collect()
    }
    got = {
        r.doc_id: (r.n_bpe_tokens, r.seg_hash)
        for r in bpe_doc_stats(df, "text", merges).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], f"doc {k}: {got[k]} != {want[k]}"
