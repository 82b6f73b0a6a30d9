"""DSIR importance resampling (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_import_spark.functions.unigram import ilog2_fp
from batch_import_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_counts,
)


def _fixture(spark):
    # target docs are all-"alpha"; raw candidates range from
    # target-like to totally unlike
    return spark.createDataFrame(
        [
            (0, "alpha beta alpha beta", "tgt"),
            (1, "alpha beta alpha", "tgt"),
            (10, "alpha beta alpha beta", "raw"),   # exactly target-like
            (11, "alpha gamma", "raw"),             # half-like
            (12, "delta epsilon zeta", "raw"),      # unlike
            (13, "   ", "raw"),                     # blank -> no rows
        ],
        "doc_id long, text string, source string",
    )


def test_hashed_ngram_counts_shape(spark):
    f = hashed_ngram_counts(_fixture(spark), n_buckets=16)
    rows = f.collect()
    assert all(0 <= r.bucket < 16 for r in rows)
    per_doc = {
        r.doc_id: r.total
        for r in f.groupBy("doc_id").agg(F.sum("cnt").alias("total")).collect()
    }
    # doc 0: 4 unigrams + 3 bigrams = 7 grams
    assert per_doc[0] == 7
    assert per_doc[11] == 3  # 2 unigrams + 1 bigram
    assert 13 not in per_doc  # blank doc yields no features


def test_weights_rank_target_likeness(spark):
    docs = _fixture(spark)
    w = {
        r.doc_id: r.weight_fp
        for r in dsir_weights(
            docs, F.col("source") == "tgt", n_buckets=32
        ).collect()
    }
    # only candidates are scored
    assert set(w) == {10, 11, 12}
    # more target-like -> strictly higher importance weight
    assert w[10] > w[11] > w[12]


def test_select_topk_rank_and_determinism(spark):
    docs = _fixture(spark)
    sel = dsir_select(docs, F.col("source") == "tgt", k=2, n_buckets=32)
    rows = sorted(sel.collect(), key=lambda r: r.sel_rank)
    assert [r.doc_id for r in rows] == [10, 11]
    assert [r.sel_rank for r in rows] == [1, 2]
    again = sorted(
        dsir_select(docs, F.col("source") == "tgt", k=2, n_buckets=32)
        .collect(),
        key=lambda r: r.sel_rank,
    )
    assert [(r.doc_id, r.weight_fp) for r in rows] == [
        (r.doc_id, r.weight_fp) for r in again
    ]


def test_weight_hand_check_single_bucket_world(spark):
    """With n_buckets=1 every gram lands in bucket 0, so the weight
    collapses to n_grams · lam_0 with lam_0 computable by hand."""
    docs = _fixture(spark)
    w = {
        r.doc_id: r
        for r in dsir_weights(
            docs, F.col("source") == "tgt", n_buckets=1
        ).collect()
    }
    # target grams: doc0=7, doc1=5 -> t_0=12; raw grams: 7+3+5=15
    lam = (ilog2_fp(12 + 1) - ilog2_fp(12 + 1)) - (
        ilog2_fp(15 + 1) - ilog2_fp(15 + 1)
    )
    assert lam == 0  # single bucket: both LMs are the whole mass
    for doc_id, n in ((10, 7), (11, 3), (12, 5)):
        assert w[doc_id].n_grams == n
        assert w[doc_id].weight_fp == n * lam
