"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM with N executor threads; the settings below are
chosen so the SAME code scales to a multi-executor cluster:

- ``spark.sql.shuffle.partitions`` sized to cores here; on a real cluster
  this (or AQE coalescing) is sized to total cores.
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching — the knobs that matter at 100 TB.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (duckdb timestamps are UTC-naive).
- Arrow enabled: every pandas_udf / applyInPandas / toPandas crossing is
  Arrow-batched, never row-at-a-time pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "flink_tank_spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    Respects ``SPARK_GRAFT_CPUS``; defaults to all local cores.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Local test files are single-digit-MB single parquet files; the
        # 128 MB default would scan each table as ONE partition and
        # serialize every downstream pipeline onto one core. 4 MB keeps
        # local scans parallel; on a real cluster raise it back via env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        # RocksDB state store: the backend you'd pick at 100 TB (spills
        # to disk, incremental checkpoints) — and required by the
        # transformWithState API family if enabled later.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    # Optional Maven coordinates (comma-separated) resolved at session
    # start — the supported way to pull the spark-sql-kafka connector for
    # the real-broker E2E (Makefile `kafka-e2e`). Needs network; unset =
    # no resolution attempt, offline suite unaffected.
    packages = os.environ.get("SPARK_GRAFT_PACKAGES")
    if packages:
        builder = builder.config("spark.jars.packages", packages)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
