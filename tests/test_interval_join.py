"""Stream-stream interval join (streaming/interval_join.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from batch_import_spark.streaming.interval_join import interval_join

_US = 1_000_000
# 2025-01-01 base: event times near the 1970 epoch silently break
# Spark's range-join state pruning (the derived state watermark
# `watermark - max_lag` underflows below 0 and the join emits
# nothing) — verified on pyspark 4.1; keep fixtures in modern time
_BASE = 1_735_689_600 * _US


def _mins(m):
    return _BASE + m * 60 * _US


def _table(rows, idx_name, ts_name):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            idx_name: pa.array([r[1] for r in rows], pa.int32()),
            ts_name: pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )


def _start(spark, src_l, src_r, name, max_lag="1 hour", watermark="1 minute"):
    left = (
        spark.readStream.schema("conv_id string, prompt_idx int, req_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_l))
    )
    right = (
        spark.readStream.schema(
            "conv_id string, response_idx int, res_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_r))
    )
    out = interval_join(
        left,
        right,
        left_ts="req_ts",
        right_ts="res_ts",
        max_lag=max_lag,
        watermark=watermark,
    ).select("conv_id", "prompt_idx", "response_idx")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_window_semantics_and_batch_twin(spark, tmp_path):
    """Only (0, max_lag] matches join; the streaming result equals the
    batch plan on the same rows (the oracle contract)."""
    src_l, src_r = tmp_path / "l", tmp_path / "r"
    os.makedirs(src_l), os.makedirs(src_r)
    lrows = [("c1", 0, _mins(0)), ("c2", 0, _mins(0))]
    rrows = [
        ("c1", 1, _mins(30)),   # in window -> match
        ("c1", 2, _mins(90)),   # > 1 hour -> no
        ("c2", 3, _mins(0)),    # not strictly after -> no
        ("c9", 4, _mins(10)),   # wrong conv -> no
    ]
    pq.write_table(_table(lrows, "prompt_idx", "req_ts"), src_l / "b1.parquet")
    pq.write_table(_table(rrows, "response_idx", "res_ts"), src_r / "b1.parquet")

    got = {
        (r.conv_id, r.prompt_idx, r.response_idx)
        for r in _start(spark, src_l, src_r, "ij_window").collect()
    }
    assert got == {("c1", 0, 1)}

    # batch twin: identical plan, identical result
    lb = spark.createDataFrame(
        [(c, i, t // _US) for c, i, t in lrows],
        "conv_id string, prompt_idx int, s long",
    ).select("conv_id", "prompt_idx", F.timestamp_seconds("s").alias("req_ts"))
    rb = spark.createDataFrame(
        [(c, i, t // _US) for c, i, t in rrows],
        "conv_id string, response_idx int, s long",
    ).select(
        "conv_id", "response_idx", F.timestamp_seconds("s").alias("res_ts")
    )
    batch = {
        (r.conv_id, r.prompt_idx, r.response_idx)
        for r in interval_join(
            lb, rb, left_ts="req_ts", right_ts="res_ts"
        ).select("conv_id", "prompt_idx", "response_idx").collect()
    }
    assert batch == got


def test_match_survives_micro_batch_boundary(spark, tmp_path):
    """Left arrives in batch 1, its response in batch 2 — the join
    state must hold the left row across the trigger."""
    src_l, src_r = tmp_path / "l", tmp_path / "r"
    os.makedirs(src_l), os.makedirs(src_r)
    pq.write_table(
        _table([("c1", 0, _mins(0))], "prompt_idx", "req_ts"),
        src_l / "b1.parquet",
    )
    # right batch 1 is an unrelated early event; the match lands later
    pq.write_table(
        _table([("zz", 9, _mins(1))], "response_idx", "res_ts"),
        src_r / "b1.parquet",
    )
    pq.write_table(
        _table([("c1", 1, _mins(40))], "response_idx", "res_ts"),
        src_r / "b2.parquet",
    )
    base = os.path.getmtime(src_r / "b1.parquet")
    os.utime(src_r / "b2.parquet", (base + 10, base + 10))

    got = {
        (r.conv_id, r.prompt_idx, r.response_idx)
        for r in _start(spark, src_l, src_r, "ij_xbatch").collect()
    }
    assert got == {("c1", 0, 1)}


def test_watermark_evicts_expired_state(spark, tmp_path):
    """Once the global watermark passes left_ts + max_lag, the left
    row is evicted and a late right event cannot match it — the
    bounded-state contract that makes the join runnable forever."""
    src_l, src_r = tmp_path / "l", tmp_path / "r"
    os.makedirs(src_l), os.makedirs(src_r)
    # batch 1: the left row plus far-future rows on BOTH sides (the
    # global watermark is the min across inputs)
    pq.write_table(
        _table(
            [("c1", 0, _mins(0)), ("_wm", 8, _mins(600))],
            "prompt_idx",
            "req_ts",
        ),
        src_l / "b1.parquet",
    )
    pq.write_table(
        _table([("_wm", 9, _mins(600))], "response_idx", "res_ts"),
        src_r / "b1.parquet",
    )
    # batch 2: only advances the watermark further — state cleanup
    # runs AFTER each batch's inputs are joined, so the left row is
    # provably evicted before batch 3 arrives
    pq.write_table(
        _table([("_wm", 7, _mins(1200))], "response_idx", "res_ts"),
        src_r / "b2.parquet",
    )
    # batch 3: a response that WOULD match c1 but arrives long after
    # the watermark passed req_ts + 1 h
    pq.write_table(
        _table([("c1", 1, _mins(30))], "response_idx", "res_ts"),
        src_r / "b3.parquet",
    )
    base = os.path.getmtime(src_r / "b1.parquet")
    os.utime(src_r / "b2.parquet", (base + 10, base + 10))
    os.utime(src_r / "b3.parquet", (base + 20, base + 20))

    got = _start(spark, src_l, src_r, "ij_evict").collect()
    assert {(r.conv_id, r.prompt_idx, r.response_idx) for r in got} == set()


def test_entry_query_matches_sft_lag(spark):
    """The registry replay is non-vacuous and every lag is in (0, 1h]."""
    import __spark_entry__ as entry

    rows = entry.queries()["stream_interval_join"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    assert all(0 < r.lag_sec <= 3600 for r in rows)
