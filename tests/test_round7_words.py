"""Round-7 optimization pins: the codegen-friendly tokenization and
n-gram kernels must be BIT-IDENTICAL to the higher-order-function
formulations they replaced (the oracle SQL is frozen, so any drift is
a correctness regression, not a style choice)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


EDGE_TEXTS = [
    "",
    " ",
    "\t",
    "\n\n",
    "a",
    " a ",
    "\ta b\tc\n",
    "a  b",
    "\t\t",
    "x y z w",
    "  leading",
    "trailing  ",
    "\nonly\n",
    "ONE two THREE four five",
    "a b",  # NBSP is NOT Java \s — must stay one token
    None,
]


def _hof_words(c):
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != F.lit("")
    )


def test_trim_empty_endpoints_equals_hof_filter(spark):  # noqa: F811
    from batch_import_spark.operators.lm import (
        _split_raw,
        _trim_empty_endpoints,
    )

    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    out = df.select(
        "text",
        _hof_words(F.col("text")).alias("o"),
        _trim_empty_endpoints(_split_raw("text")).alias("n"),
    ).collect()
    for r in out:
        assert r.o == r.n, f"mismatch for {r.text!r}: {r.o} != {r.n}"


@pytest.mark.parametrize("n", [2, 3, 5])
def test_ngrams_from_tokens_equals_per_index_slice(spark, n):  # noqa: F811
    from batch_import_spark.operators.contamination import (
        _ngram_arrays,
        _ngrams_from_tokens,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    # the pre-round-7 formulation: per-index slice over the HOF tokens
    toks = _hof_words(F.col("text"))
    old = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1), F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = (
        df.select("doc_id", F.array_distinct(old).alias("o"))
        .join(
            _ngram_arrays(df, F.col("doc_id"), "text", n).select(
                F.col("_id").alias("doc_id"), F.col("_ngs").alias("g")
            ),
            "doc_id",
        )
        .collect()
    )
    for r in got:
        assert r.o == r.g, f"n={n} doc {r.doc_id}: {r.o} != {r.g}"
