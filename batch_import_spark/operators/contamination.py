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
