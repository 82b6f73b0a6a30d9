"""SparkSession factory tuned for the KG-construction workload.

The reference (Importer.java:63-65) tunes a single JVM's mmap buffers;
our equivalent knob set is shuffle partitioning, AQE, and Arrow batch
size. All settings are public Spark configs.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime coalescing of shuffle partitions + skew-join
  splitting replaces any hand-scheduling the reference does.
- ``spark.sql.shuffle.partitions`` here is a local[32] default; on a
  real cluster set it ~2-3x total cores — AQE coalesces down.
- Arrow self-destruct + batch size keep pandas-UDF memory bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "batch-import-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all
    cores) so the same entry point serves tests, bench, and a real
    ``spark-submit`` (where master is supplied externally and this
    default is ignored because the session already exists).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 32

    # shuffle/spill scratch: prefer tmpfs in this container (the
    # overlay FS makes first-shuffle writes 2-3x slower at high
    # parallelism); on a real cluster point this at fast local disks
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # fail-fast typed conversion (readme.md:41-42 'Conversion
        # failure will result in abort') requires ANSI mode — set it
        # explicitly on the production path, never trust the default
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet scan sizing: 128 MB splits keep task counts sane at scale
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
