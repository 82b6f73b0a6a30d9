"""Checkpointed resume: partial run + resume == single full run."""

from batch_import_spark.pipeline.checkpoint import KgCheckpointer
from batch_import_spark.pipeline.kg import run_kg_pipeline
from batch_import_spark.sources.transcripts import alias_dict_df, generate_transcripts


def _triples(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_resume_is_idempotent_and_complete(spark, tmp_path):
    t = generate_transcripts(spark, n_convs=24, median_turns=6, hot_factor=5)
    t = t.localCheckpoint(eager=True)
    alias = alias_dict_df(spark)

    # ground truth: one-shot pipeline
    full = _triples(run_kg_pipeline(t, alias).triples)

    ck = KgCheckpointer(spark, str(tmp_path / "kg"), n_buckets=8)
    # partial run (simulates a crash after 3 buckets)
    r1 = ck.resume(t, alias, run_id="r1", max_buckets=3)
    assert r1["buckets_processed"] == 3
    assert len(ck.done_buckets()) == 3

    # resume picks up ONLY the remaining buckets
    r2 = ck.resume(t, alias, run_id="r2")
    assert r2["buckets_processed"] > 0
    assert len(ck.done_buckets()) <= 8

    # a third resume is a no-op (idempotent)
    r3 = ck.resume(t, alias, run_id="r3")
    assert r3["buckets_processed"] == 0

    assert _triples(ck.triples()) == full

    # manifest lineage: every bucket has counters, turns sum to input
    m = ck.manifest()
    total_turns = sum(r["n_turns"] for r in m.collect())
    assert total_turns == t.count()
    assert all(r["n_mentions"] >= r["n_linked"] for r in m.collect())
