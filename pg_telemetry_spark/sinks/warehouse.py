"""Concrete warehouse sinks behind one interface.

``ParquetWarehouseSink`` is the locally-testable warehouse (the
MergeTree-analog layout from warehouse/layout.py, one directory per
micro-batch).  ``JdbcWarehouseSink`` is the production seam: the same
``write_batch`` contract over ``df.write.format("jdbc")`` — pointing
it at a ClickHouse JDBC URL (or swapping the format string for a
native ClickHouse Spark connector where available) is a configuration
change, not a code change.  No ClickHouse driver is hard-imported
anywhere; the engine never depends on it to run.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetWarehouseSink:
    """Day-partitioned Parquet warehouse, one subdir per micro-batch
    (overwrite-by-batchId = idempotent under replays)."""

    path: str
    buckets: int = 32

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("event_date", F.col("ts").cast("date"))
            .repartition(self.buckets, "user_id")
            .sortWithinPartitions("user_id", "ts")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(f"{self.path}/batch_id={batch_id}")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.path).parquet(f"{self.path}/batch_id=*")


@dataclass
class JdbcWarehouseSink:
    """JDBC batch insert (ClickHouse/Postgres/any warehouse with a
    JDBC driver).  Idempotence strategy: a ``batch_id`` column +
    ReplacingMergeTree (ClickHouse) or an ON CONFLICT target —
    warehouse-side dedup keyed by (batch_id, event_id)."""

    url: str
    table: str
    mode: str = "append"
    batch_size: int = 100_000

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("batchsize", self.batch_size)
            .mode(self.mode)
            .save()
        )
