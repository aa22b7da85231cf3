"""SparkSession factory tuned for this engine.

Local-mode testing (local[N], one JVM) but every default is chosen so the
same logical plans scale to a 1000-executor cluster reading 100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — at 100 TB the static plan is always
  wrong somewhere; AQE re-plans from runtime stats.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden per-deploy (or left to AQE's coalescing with a high initial).
- UTC session timezone: deterministic timestamp semantics vs the oracle.
- Arrow enabled: every Python-side operator (pandas UDFs, toPandas)
  moves columnar batches, never pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "kafka_spark_streaming_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_cpus()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture parquet stores event times as timestamp[us] with no tz
        # annotation; Spark 4 would infer TIMESTAMP_NTZ, which watermarks
        # and unix_micros() reject. Session tz is UTC, so reading them as
        # plain TIMESTAMP preserves the instant and matches DuckDB.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.checkpointLocation.create.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
