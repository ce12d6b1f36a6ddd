"""Partitioned, sorted warehouse writer + retention + rollup.

MergeTree ``ORDER BY (series, ts)`` + TTL ≈ this module:

- partition by ``event_date`` (directory-level pruning: a time-slice
  query touches one day's files, not 100 TB),
- ``repartition(user_id)`` + ``sortWithinPartitions(user_id, ts)``
  inside each partition (run-length + min-max friendly pages, so
  per-series scans skip row groups),
- retention = partition drop by age (a metadata operation — no
  rewrite of surviving data),
- downsampling = hourly rollup written alongside raw (the
  materialized-view analog; sum/count compose, avg derived at read).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_events_warehouse(
    events: DataFrame,
    path: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write events day-partitioned and series-sorted within files."""
    (
        events.withColumn("event_date", F.col("ts").cast("date"))
        .repartition(buckets, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_warehouse(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def drop_partitions_older_than(spark: SparkSession, path: str, cutoff_date: str) -> int:
    """Retention: drop whole day-partitions older than ``cutoff_date``.

    Partition-level deletes are metadata-cheap; surviving data is
    never rewritten.  Returns the number of partitions dropped."""
    import shutil
    from pathlib import Path

    dropped = 0
    for part in sorted(Path(path).glob("event_date=*")):
        if part.name.split("=", 1)[1] < cutoff_date:
            shutil.rmtree(part)
            dropped += 1
    return dropped


def write_hourly_rollup(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Hourly pre-aggregation rollup (re-aggregable: sum/count only)."""
    (
        events.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
            "user_id",
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .withColumn("event_date", F.col("bucket").cast("date"))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )
