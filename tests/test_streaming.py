"""Streaming KG: file-source micro-batches → windowed triples parquet.

Drives a real StreamingQuery (not just plan construction): transcripts
written as parquet files become a file-source stream; the windowed
triple counts must equal the batch pipeline's counts for the same
data once the stream drains (availableNow trigger).
"""

import pytest
from pyspark.sql import functions as F

from batch_import_spark.pipeline.kg import prepare_link_dict, run_kg_pipeline
from batch_import_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    alias_dict_df,
    generate_transcripts,
)
from batch_import_spark.streaming.stream_kg import streaming_triples, streaming_turn_stats


def test_stream_matches_batch(spark, tmp_path):
    t = generate_transcripts(spark, n_convs=12, median_turns=6, hot_factor=3)
    src = str(tmp_path / "stream_src")
    t.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    link_dict = prepare_link_dict(alias_dict_df(spark))
    # unwindowed variant + complete mode: the bounded replay must
    # converge to exactly the batch pipeline's totals
    triples = streaming_triples(stream, link_dict, window_duration=None)
    q = (
        triples.writeStream.outputMode("complete")
        .format("memory")
        .queryName("triples_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "select subj, pred, obj, n_occurrences as n from triples_stream"
    )
    batch = run_kg_pipeline(t, alias_dict_df(spark)).edges.select(
        "subj", "pred", "obj", F.col("n_occurrences").alias("n")
    )
    g = {(r["subj"], r["pred"], r["obj"]): r["n"] for r in got.collect()}
    b = {(r["subj"], r["pred"], r["obj"]): r["n"] for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_turn_stats_runs(spark, tmp_path):
    t = generate_transcripts(spark, n_convs=6, median_turns=5, hot_factor=2)
    src = str(tmp_path / "src2")
    t.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    stats = streaming_turn_stats(stream)
    q = (
        stats.writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from turn_stats").collect()
    # append mode emits only watermark-closed windows; with a bounded
    # file source the final watermark closes all but the last window —
    # presence of the query result (even empty) proves the plan runs;
    # role values are sane when present
    assert all(r["role"] in ("user", "assistant", "tool") for r in rows)
