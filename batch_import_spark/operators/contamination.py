"""Benchmark-contamination screening for training corpora.

Before training, every corpus must be screened against the eval /
benchmark sets it will be scored on: any document sharing long word
n-grams with a benchmark item is contaminated and either dropped or
flagged. This is the standard n-gram-overlap formulation (cf. the
GPT-3/PaLM appendix methodology: 8-13 token n-gram collision against
eval sets).

Shape at 100 TB: the benchmark side is tiny (thousands of items) —
its distinct n-gram set broadcasts; the corpus side is one explode +
per-doc distinct + one broadcast semi-join + one map-side-combinable
groupBy. No shuffle touches corpus text; only (doc_id, ngram) pairs
for docs that overlap at all. The contamination fraction is integer
ppm (n_hit·10^6 div n_total) — engine-exact, no float thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined word n-grams of ``text_col`` (empty when
    the document has fewer than n tokens)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    # guard the sequence: Spark infers a NEGATIVE step for
    # sequence(1, 0), so short docs must short-circuit to []
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1), F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
) -> DataFrame:
    """Per-document benchmark overlap: returns
    (doc_id, n_hit, n_total, contam_ppm) for every document sharing at
    least one word n-gram with the probe corpus.

    - n_total: the document's DISTINCT n-gram count
    - n_hit:   how many of those occur anywhere in ``probes``
    - contam_ppm = n_hit·10^6 div n_total (integer parts-per-million)

    Production screens use n in 8..13; smaller n over-flags natural
    phrase reuse. The probe n-gram set is broadcast — benchmark sets
    are always tiny next to the corpus.
    """
    doc_ngrams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_ngrams(text_col, n)).alias("ng"),
    ).distinct()
    probe_ngrams = (
        probes.select(F.explode(_word_ngrams(probe_text_col or text_col, n)).alias("ng"))
        .distinct()
    )
    totals = doc_ngrams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    hits = (
        doc_ngrams.join(F.broadcast(probe_ngrams), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        "n_hit",
        "n_total",
        F.expr("n_hit * 1000000L div n_total").alias("contam_ppm"),
    )


def containment_pairs(
    left: DataFrame,
    right: DataFrame,
    n: int = 8,
    min_ppm: int = 500_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ngram_df: int | None = 10_000,
) -> DataFrame:
    """Quote detection: (left_id, right_id, n_shared, n_left,
    containment_ppm) for every pair where at least ``min_ppm``
    parts-per-million of LEFT's distinct word n-grams also occur in
    the RIGHT document — the asymmetric companion to Jaccard
    (containment ≈ 1 catches a short document quoted inside a long
    one, where Jaccard stays near 0). The standard screen for
    benchmark items embedded verbatim in training documents.

    Scale shape: candidate pairs come from an equi-join on the n-gram
    itself, so cost is Σ_g df_left(g)·df_right(g) — bounded by capping
    ubiquitous n-grams at ``max_ngram_df`` occurrences on the right
    (boilerplate n-grams carry no quote signal; the cap is the same
    hot-key guard as the LSH bucket caps, and None disables it). The
    count/total aggregation is map-side combinable; no text ever
    shuffles.
    """
    ln = left.select(
        F.col(id_col).alias("lid"), F.explode(_word_ngrams(text_col, n)).alias("ng")
    ).distinct()
    rn = right.select(
        F.col(id_col).alias("rid"), F.explode(_word_ngrams(text_col, n)).alias("ng")
    ).distinct()
    if max_ngram_df is not None:
        df_counts = rn.groupBy("ng").agg(F.count(F.lit(1)).alias("_df"))
        rn = rn.join(
            df_counts.where(F.col("_df") <= max_ngram_df).select("ng"), "ng"
        )
    totals = ln.groupBy("lid").agg(F.count(F.lit(1)).alias("n_left"))
    shared = ln.join(rn, "ng").groupBy("lid", "rid").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        shared.join(totals, "lid")
        .withColumn("containment_ppm", F.expr("n_shared * 1000000L div n_left"))
        .where(F.col("containment_ppm") >= min_ppm)
        .select("lid", "rid", "n_shared", "n_left", "containment_ppm")
    )
