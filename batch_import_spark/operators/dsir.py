"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
profile looks like a small target corpus.

The published recipe: featurize every document as a bag of hashed
unigrams+bigrams over ``n_buckets`` buckets, fit two bag-of-buckets
LMs — p (target corpus) and q (raw corpus) — and weight each raw
document by its log importance ratio

    log w(x) = sum_b  count_b(x) * (log p_b - log q_b)

then resample/top-k by weight. Reference analog: none (the reference
is a CSV importer, readme.md:1-40) — training-data surface the brief
requires.

Determinism contract (both engines replay bit-for-bit):

- Bucket = ``portable_hash60(gram) % n_buckets`` (the md5-based
  60-bit portable hash, operators/sketches.py:35 — non-negative, so
  ``%`` and ``pmod`` agree).
- Logs are the fixed-point integer log2 of functions/unigram.py
  (``ilog2_fp``) — no libm in cross-engine contracts (the
  operators/lm.py discipline). Add-one smoothing over the full
  bucket grid:

      lam_b = [ilog2(t_b + 1) - ilog2(T + B)]
            - [ilog2(r_b + 1) - ilog2(R + B)]

  with T = sum t_b, R = sum r_b, so every bucket (even one unseen in
  both corpora) has a finite lambda and the weight is an exact
  BIGINT sum.
- Top-k tie-break: (weight_fp DESC, doc_id ASC) row_number.

Scale shape: featurization is one explode + one map-side-combinable
(doc, bucket) groupBy; the two LMs are one more groupBy over the
SAME featurized table (B-bounded output); scoring joins the per-doc
bucket counts against the broadcast B-row lambda table — no shuffle
wider than the feature table, no iteration, no driver state. The
scalar totals ride a sanctioned broadcast single-row cross join
(the operators/sampling.py temperature_mixture pattern). At 100 TB
the featurize groupBy is the only big shuffle and it partial-
aggregates; the lambda table stays n_buckets rows regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_import_spark.functions.unigram import ilog2_fp
from batch_import_spark.operators.lm import _adjacent_pairs, _words
from batch_import_spark.operators.sketches import portable_hash60

N_BUCKETS = 128


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry_cols, bucket, cnt): unigram + bigram tokens hashed
    into ``n_buckets`` buckets. Blank docs yield no rows (both
    engines). ``carry_cols`` ride through the explode + groupBy —
    per-doc flags (e.g. the DSIR target flag) are functionally
    dependent on the id, so carrying them is free and saves a
    doc-keyed join back (one whole SortMergeJoin at corpus scale)."""
    toks = _words(text_col)
    bigrams = F.transform(
        _adjacent_pairs(toks), lambda s: F.concat_ws(" ", s["w1"], s["w2"])
    )
    carry = [F.col(c) for c in carry_cols]
    return (
        docs.select(
            F.col(id_col), *carry,
            F.explode(F.concat(toks, bigrams)).alias("gram"),
        )
        .select(
            id_col,
            *carry,
            F.pmod(portable_hash60(F.col("gram")), F.lit(n_buckets)).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, *carry_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bucket_log_probs(
    feats: DataFrame,
    spark,
    n_buckets: int,
    count_col: str = "cnt",
) -> DataFrame:
    """(bucket, lp_fp): add-one-smoothed fixed-point log2 probability
    per bucket over the FULL 0..B-1 grid (zero-count buckets get the
    smoothed floor).

    The bucket count table is n_buckets rows BY CONTRACT, so the log
    runs driver-side on the collected counts (``ilog2_fp``, pinned
    equal to its column twin in tests/test_unigram.py): the unrolled
    integer-log COLUMN tree costs ~2 s of analysis/codegen per query
    at any data size (measured at sf0.1), which dominated the whole
    DSIR entry when paid four times. One n_buckets-row collect per LM
    is the same bounded-driver-traffic discipline as the BPE/unigram
    vocab folds."""
    lp = _bucket_log_prob_map(feats, n_buckets, count_col)
    return spark.createDataFrame(
        sorted(lp.items()), "bucket int, lp_fp long"
    )


def _bucket_log_prob_map(
    feats: DataFrame, n_buckets: int, count_col: str = "cnt"
) -> dict[int, int]:
    """The driver-side core of ``_bucket_log_probs``: bucket →
    add-one-smoothed fixed-point log2 probability."""
    counts = {
        int(r.bucket): int(r.c)
        for r in feats.groupBy("bucket")
        .agg(F.sum(count_col).cast("long").alias("c"))
        .collect()
    }
    total = sum(counts.values()) + n_buckets
    it = ilog2_fp(total)
    return {
        b: ilog2_fp(counts.get(b, 0) + 1) - it for b in range(n_buckets)
    }


def dsir_lambda_map(
    ff: DataFrame, n_buckets: int, target_flag: str = "_is_target"
) -> dict[int, int]:
    """bucket → lam_fp = log p_target - log q_raw, the frozen DSIR
    importance model (n_buckets integers — shippable as a literal to
    a streaming screen or broadcast as a tiny table)."""
    lp_t = _bucket_log_prob_map(ff.where(F.col(target_flag)), n_buckets)
    lp_r = _bucket_log_prob_map(ff.where(~F.col(target_flag)), n_buckets)
    return {b: lp_t[b] - lp_r[b] for b in range(n_buckets)}


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-candidate-document importance weight: (id, n_grams,
    weight_fp). Candidates are the rows where ``target_pred`` is
    false; the target corpus (pred true) only shapes the numerator
    LM, exactly as in the paper (select raw data that resembles the
    target)."""
    spark = docs.sparkSession
    tagged = docs.withColumn("_is_target", target_pred)
    # the featurize explode + groupBy feeds THREE consumers (target
    # LM, raw LM, final scoring) — checkpoint it once or Spark
    # re-runs the whole md5-per-gram scan per consumer (3x cost,
    # measured 13 s -> ~5 s at sf0.1)
    ff = hashed_ngram_counts(
        tagged, id_col, text_col, n_buckets, carry_cols=("_is_target",)
    ).localCheckpoint(eager=False)
    lam = spark.createDataFrame(
        sorted(dsir_lambda_map(ff, n_buckets).items()),
        "bucket int, lam_fp long",
    )
    return (
        ff.where(~F.col("_is_target"))
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam_fp")).cast("long").alias(
                "weight_fp"
            ),
        )
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic top-k selection by importance weight:
    (id, n_grams, weight_fp, sel_rank). The paper's Gumbel resampling
    is replaced by the rank cut — the deterministic variant — so both
    engines agree exactly; plug a seeded Gumbel column in front of
    the window for the stochastic flavor."""
    w = dsir_weights(docs, target_pred, id_col, text_col, n_buckets)
    win = Window.orderBy(F.col("weight_fp").desc(), F.col(id_col).asc())
    return (
        w.withColumn("sel_rank", F.row_number().over(win).cast("int"))
        .where(F.col("sel_rank") <= k)
    )
