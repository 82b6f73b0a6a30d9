"""Triple-set precision/recall — the north rule's acceptance metric
(P/R ≥ 0.95 vs the reference's emitted (subj, pred, obj) set) as a
first-class distributed operator, so pipeline changes can be gated on
it directly.

One full-outer join on the triple key and one global aggregate — the
whole evaluation is a single shuffle regardless of corpus size; no
collect of either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_triples(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """P/R/F1 of the predicted triple SET against the gold SET
    (occurrence counts are ignored — the rule compares sets).

    Returns one row: (n_pred, n_gold, n_correct, precision, recall,
    f1). Ratios are floor-truncated at 1e-6 (the cross-engine
    decimal-tie discipline); F1 is computed as 2·|∩| / (|P| + |G|),
    the harmonic mean of the exact P and R.
    """
    p = predicted.select("subj", "pred", "obj").distinct().withColumn("_p", F.lit(1))
    g = gold.select("subj", "pred", "obj").distinct().withColumn("_g", F.lit(1))
    j = p.join(g, ["subj", "pred", "obj"], "full")
    agg = j.agg(
        F.sum("_p").alias("n_pred"),
        F.sum("_g").alias("n_gold"),
        F.sum(F.col("_p") * F.col("_g")).alias("n_correct"),
    )

    def ratio(num, den):
        return F.when(
            den > 0, F.floor(num.cast("double") / den * 1e6) / 1e6
        ).otherwise(F.lit(0.0))

    return agg.select(
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_gold").cast("long").alias("n_gold"),
        F.col("n_correct").cast("long").alias("n_correct"),
        ratio(F.col("n_correct"), F.col("n_pred")).alias("precision"),
        ratio(F.col("n_correct"), F.col("n_gold")).alias("recall"),
        ratio(2 * F.col("n_correct"), F.col("n_pred") + F.col("n_gold")).alias("f1"),
    )
