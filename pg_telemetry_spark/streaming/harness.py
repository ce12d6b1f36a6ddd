"""Micro-batch test harness for Structured Streaming operators.

Drives a file-stream source the way the reference's collector drives
its ingest loop: Parquet files land in a directory one batch at a
time; each ``run_available`` call starts the stream with
``Trigger.AvailableNow`` against the SAME checkpoint, so only
newly-landed files are processed — exactly the restart-and-catch-up
semantics of a production collector, compressed into a test.

Output is captured through ``foreachBatch`` (driver-side in local
mode), which is also the engine's warehouse-sink seam: in production
the capture function is replaced by ``batch_df.write.format("jdbc")``
(or a ClickHouse connector) keyed by ``batchId`` for idempotence.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class FileStreamHarness:
    spark: SparkSession
    schema: T.StructType
    base_dir: str = field(default_factory=lambda: tempfile.mkdtemp(prefix="pgts_stream_"))
    _batch_no: int = 0

    @property
    def landing(self) -> str:
        return f"{self.base_dir}/landing"

    def checkpoint(self, name: str) -> str:
        return f"{self.base_dir}/ckpt_{name}"

    def add_batch(self, df: DataFrame) -> None:
        """Land one micro-batch as a Parquet file."""
        Path(self.landing).mkdir(parents=True, exist_ok=True)
        df.coalesce(1).write.mode("append").parquet(self.landing)
        self._batch_no += 1

    def stream(self) -> DataFrame:
        return self.spark.readStream.schema(self.schema).parquet(self.landing)

    def run_available(
        self,
        transformed: DataFrame,
        name: str,
        output_mode: str = "update",
    ) -> list[list]:
        """Run the stream to exhaustion (AvailableNow); return the rows
        captured from each micro-batch as lists of Row."""
        captured: list[list] = []

        def capture(batch_df: DataFrame, batch_id: int) -> None:
            captured.append(batch_df.collect())

        q = (
            transformed.writeStream.foreachBatch(capture)
            .outputMode(output_mode)
            .option("checkpointLocation", self.checkpoint(name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return captured
