"""Time-partitioned layout (operators/layout.py): partition pruning
must be visible in the plan, not just hoped for."""

import datetime

from pyspark.sql import functions as F

from batch_import_spark.operators.layout import (
    read_time_range,
    write_time_partitioned,
)


def _events(spark, n_days=6, per_day=20):
    base = datetime.datetime(2025, 3, 1)
    rows = [
        (d * per_day + i, base + datetime.timedelta(days=d, minutes=i), i * 10)
        for d in range(n_days)
        for i in range(per_day)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value long")


def test_round_trip_and_date_column(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(_events(spark), path, sort_cols=["value"])
    out = read_time_range(spark, path, "2025-03-02", "2025-03-03")
    assert out.count() == 40
    days = {str(r["event_date"]) for r in out.select("event_date").distinct().collect()}
    assert days == {"2025-03-02", "2025-03-03"}


def test_partition_pruning_in_plan(spark, tmp_path):
    path = str(tmp_path / "events_pruned")
    write_time_partitioned(_events(spark), path)
    out = read_time_range(spark, path, "2025-03-04", "2025-03-04")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the date bounds must appear as PartitionFilters on the scan —
    # pruning happens at planning, non-matching dirs are never opened
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:300]
    # and the scan's selected partition count is 1 of 6
    n_files = out.select(F.input_file_name()).distinct().count()
    all_files = (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )
    assert n_files < all_files


def test_unpartitioned_read_sees_everything(spark, tmp_path):
    path = str(tmp_path / "events_all")
    write_time_partitioned(_events(spark), path)
    assert spark.read.parquet(path).count() == 120
