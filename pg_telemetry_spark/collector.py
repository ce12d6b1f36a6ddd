"""The collector pipeline — the reference's job, Spark-native.

A ``pg_telemetry``-class system is a loop: snapshot Postgres stat
views, timestamp the rows, ship them to a columnar warehouse, let the
warehouse serve time-series queries.  Here that loop is a Structured
Streaming job plus a warehouse layout:

    stat snapshots / event files land in ``landing_dir``
      -> readStream (explicit schema, incremental file discovery)
      -> normalize (types, UTC, derived event_date)
      -> writeStream.foreachBatch(sink.write_batch)   # exactly-once
           + incremental hourly rollup                 # MV analog
      -> warehouse serves SURVEY §2's query surface
         (partition-pruned slices, deltas/rates, last-point, ...)

Retention and downsampling are warehouse-side partition operations
(warehouse/layout.py).  The sink is an interface (sinks/) — Parquet
locally, JDBC/ClickHouse in production — so no warehouse driver is a
hard dependency.

Scale: ingestion parallelism = landing-file count × executor cores;
the warehouse write is hash-bucketed by series and sorted within
files; rollups re-aggregate sums/counts only (always composable).
A 100 TB backfill is the same code fed a bigger directory.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pg_telemetry_spark.session import prepare_session
from pg_telemetry_spark.sinks import ParquetWarehouseSink

#: Wire schema of collected telemetry rows (stat snapshots or events).
COLLECT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@dataclass
class TelemetryCollector:
    spark: SparkSession
    landing_dir: str
    warehouse_dir: str
    checkpoint_dir: str
    rollup: bool = True
    _sink: ParquetWarehouseSink = field(init=False)

    def __post_init__(self) -> None:
        prepare_session(self.spark)
        self._sink = ParquetWarehouseSink(f"{self.warehouse_dir}/raw")

    def _ship(self, batch_df: DataFrame, batch_id: int) -> None:
        """The per-micro-batch sink: raw write + incremental rollup,
        both keyed by batch_id (idempotent under replays)."""
        batch_df.persist()
        try:
            self._sink.write_batch(batch_df, batch_id)
            if self.rollup:
                (
                    batch_df.groupBy(
                        F.date_trunc("hour", "ts").alias("bucket"),
                        "user_id",
                        "event_type",
                    )
                    .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
                    .withColumn("event_date", F.col("bucket").cast("date"))
                    .write.mode("overwrite")
                    .partitionBy("event_date")
                    .parquet(f"{self.warehouse_dir}/rollup_1h/batch_id={batch_id}")
                )
        finally:
            batch_df.unpersist()

    def run_available(self) -> None:
        """Process everything currently landed, then stop (the cron-tick
        analog; a production deployment uses a processingTime trigger
        instead — same code)."""
        stream = self.spark.readStream.schema(COLLECT_SCHEMA).parquet(self.landing_dir)
        q = (
            stream.writeStream.foreachBatch(self._ship)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- query surface over the warehouse --------------------------------

    def raw(self) -> DataFrame:
        return self._sink.read(self.spark)

    def rollup_1h(self) -> DataFrame:
        return self.spark.read.option("basePath", f"{self.warehouse_dir}/rollup_1h").parquet(
            f"{self.warehouse_dir}/rollup_1h/batch_id=*"
        )

    def hourly_series(self) -> DataFrame:
        """Serve hourly charts from the rollup (never the raw table):
        re-aggregate composable sums/counts across batches."""
        return (
            self.rollup_1h()
            .groupBy("bucket", "event_type")
            .agg(
                F.sum("n").alias("n_events"),
                F.round(F.sum("sum_value"), 6).alias("sum_value"),
            )
        )
