"""Warehouse sinks — the 'DataFrame writes to ClickHouse' seam.

Every sink implements ``write_batch(df, batch_id)`` with idempotence
by batchId, so ``foreachBatch`` replays after a failure cannot
duplicate rows (Structured Streaming's WAL + an idempotent sink =
exactly-once).
"""

from pg_telemetry_spark.sinks.warehouse import JdbcWarehouseSink, ParquetWarehouseSink

__all__ = ["JdbcWarehouseSink", "ParquetWarehouseSink"]
