"""SparkSession factory with scale-appropriate defaults.

Everything here is cluster-safe: on a real cluster the master/memory
settings are supplied by spark-submit and the builder only layers the
SQL configs (AQE, UTC timestamps, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "tap-github-search-spark",
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.appName(app_name)
        # UTC everywhere: pandas_udf + TimestampType round-trips must be
        # timezone-stable (SURVEY.md §7.4).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # AQE: runtime coalescing + skew-join splitting at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # zstd lake files: ~40% smaller than snappy; trades cheap CPU
        # (which scales with executors) for I/O (which often doesn't).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # int64-micros timestamps, not the legacy INT96 default: INT96
        # columns carry NO min/max statistics, which would blind the
        # per-file ts zone maps (read_between) and row-group pruning on
        # time predicates. Iceberg mandates int64 timestamps for the
        # same reason.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Don't write per-file .crc/_SUCCESS noise into the lake dirs.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        # local mode: the driver JVM is also every executor — size the
        # heap for the thread count (8g starved 32 threads into GCLocker
        # stalls on multi-epoch merges at ~10^8 events).
        builder = builder.master(f"local[{cores}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    return builder.getOrCreate()
