"""Offline contract tests for the production warehouse seam.

No ClickHouse/Postgres server exists in the sandbox, so the seam is
pinned structurally: the exact JDBC writer config + batch schema the
sink would emit, and the ClickHouse DDL generated from the typed
schemas.  A production cutover only changes the URL.
"""

from __future__ import annotations

from pg_telemetry_spark.collector import COLLECT_SCHEMA
from pg_telemetry_spark.sinks.warehouse import JdbcWarehouseSink, clickhouse_ddl
from pg_telemetry_spark.statviews import PG_STAT_STATEMENTS


def test_jdbc_sink_writer_config_golden():
    sink = JdbcWarehouseSink(
        url="jdbc:clickhouse://warehouse:8123/telemetry",
        table="events_raw",
    )
    assert sink.writer_config() == {
        "format": "jdbc",
        "mode": "append",
        "options": {
            "url": "jdbc:clickhouse://warehouse:8123/telemetry",
            "dbtable": "events_raw",
            "batchsize": "100000",
            "isolationLevel": "NONE",
        },
    }


def test_jdbc_sink_batch_schema_golden(spark):
    """The emitted batch = wire schema + the batch_id idempotence key,
    with unchanged column types."""
    sink = JdbcWarehouseSink(url="jdbc:x://h/db", table="t")
    df = spark.createDataFrame([], COLLECT_SCHEMA)
    out = sink.prepare_batch(df, batch_id=7)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        # long, not int: the wire type must not drift when the
        # streaming batch id passes 2^31, and must match the DDL's
        # fixed Int64 version column
        ("batch_id", "bigint"),
    ]


def test_clickhouse_ddl_events_golden():
    # order_by includes event_id: ReplacingMergeTree keeps ONE row per
    # sorting key, so a non-unique key (user_id, ts alone) would
    # silently collapse distinct events sharing a timestamp; key
    # columns render non-Nullable (allow_nullable_keys=0 default)
    assert clickhouse_ddl(
        COLLECT_SCHEMA,
        "telemetry.events_raw",
        order_by=("user_id", "ts", "event_id"),
    ) == (
        "CREATE TABLE IF NOT EXISTS telemetry.events_raw (\n"
        "    `event_id` Int64,\n"
        "    `ts` DateTime64(6),\n"
        "    `user_id` Int64,\n"
        "    `event_type` Nullable(String),\n"
        "    `value` Nullable(Float64),\n"
        "    `batch_id` Int64\n"
        ")\n"
        "ENGINE = ReplacingMergeTree(`batch_id`)\n"
        "ORDER BY (`user_id`, `ts`, `event_id`)"
    )


def test_clickhouse_ddl_stat_statements_golden():
    # (queryid, snap_ts) IS the full series key of this view — unique
    # per row — so replay dedup cannot lose legitimate rows
    ddl = clickhouse_ddl(
        PG_STAT_STATEMENTS,
        "telemetry.pg_stat_statements",
        order_by=("queryid", "snap_ts"),
    )
    assert "`queryid` Int64" in ddl
    assert "`snap_ts` DateTime64(6)" in ddl
    assert "`total_exec_time` Nullable(Float64)" in ddl
    assert "ENGINE = ReplacingMergeTree(`batch_id`)" in ddl
    assert "ORDER BY (`queryid`, `snap_ts`)" in ddl


def test_clickhouse_ddl_rejects_unknown_key_columns():
    import pytest

    with pytest.raises(ValueError, match="order_by columns not in schema"):
        clickhouse_ddl(COLLECT_SCHEMA, "t", order_by=("user_id", "nope"))


def test_clickhouse_ddl_rejects_unmapped_types(spark):
    from pyspark.sql import types as T

    import pytest

    bad = T.StructType([T.StructField("v", T.ArrayType(T.FloatType()))])
    with pytest.raises(ValueError, match="no ClickHouse mapping"):
        clickhouse_ddl(bad, "t", order_by=("v",))
