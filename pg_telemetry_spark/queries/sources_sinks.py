"""Sources & sinks — SURVEY.md §2.1 (batch half).

Scans with explicit schemas (column pruning + pushdown reach the
Parquet reader), secondary-format round-trips, the JDBC stat-view
seam, and the partitioned warehouse writer.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.registry import query
from pg_telemetry_spark.sources.jdbc_pg import source_descriptor
from pg_telemetry_spark.tables import SCHEMAS, load_table
from pg_telemetry_spark.warehouse.layout import (
    read_events_warehouse,
    write_events_warehouse,
)


@query(
    "src_parquet_scan",
    group="sources",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan with explicit schema and stable column order."""
    return load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "src_events_nanos",
    group="sources",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events
""",
)
def src_events_nanos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TIMESTAMP(NANOS) workaround end-to-end: nanosAsLong read +
    microsecond conversion must reproduce DuckDB's native ns read."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "src_csv_json",
    group="sources",
    oracle="""
SELECT n.n_name, r.r_name, count(*) AS n_rows
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def src_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-format ingest parity: fixtures round-trip through CSV
    (nation) and JSON lines (region) with explicit schemas, then join
    — the result must be indistinguishable from the Parquet path."""
    tmp = tempfile.mkdtemp(prefix="pgts_fmt_")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.write.mode("overwrite").option("header", True).csv(f"{tmp}/nation_csv")
    region.write.mode("overwrite").json(f"{tmp}/region_json")
    n2 = spark.read.schema(SCHEMAS["nation"]).option("header", True).csv(f"{tmp}/nation_csv")
    r2 = spark.read.schema(SCHEMAS["region"]).json(f"{tmp}/region_json")
    return (
        n2.join(F.broadcast(r2), n2.n_regionkey == r2.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_rows"))
    )


@query("src_jdbc_pg", group="sources", tier="C")
def src_jdbc_pg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres stat-view JDBC source seam (no live DB here): records
    the configured partitioned-read plan per stat view."""
    return source_descriptor(spark)


@query("snk_parquet_part", group="sources", tier="C")
def snk_parquet_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse layout round-trip: day-partitioned, series-sorted
    write, read back -> per-day row counts (must equal source).  The
    partition column enables static + dynamic pruning (asserted by the
    plan-shape tests)."""
    tmp = tempfile.mkdtemp(prefix="pgts_wh_")
    events = load_table(spark, sf_dir, "events")
    write_events_warehouse(events, f"{tmp}/events")
    back = read_events_warehouse(spark, f"{tmp}/events")
    return (
        back.groupBy("event_date")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_date")
    )


@query(
    "src_orc",
    group="sources",
    oracle="""
SELECT s_nationkey, count(*) AS n_suppliers, round(sum(s_acctbal), 6) AS sum_acctbal
FROM supplier GROUP BY s_nationkey
""",
)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip parity: supplier written to ORC (zlib,
    dictionary-encoded — Spark's second columnar warehouse format),
    read back with explicit schema, aggregated.  Must be
    indistinguishable from the Parquet path; predicate/column pushdown
    works on ORC scans the same way (plan-shape test)."""
    tmp = tempfile.mkdtemp(prefix="pgts_orc_")
    supplier = load_table(spark, sf_dir, "supplier")
    supplier.write.mode("overwrite").orc(f"{tmp}/supplier_orc")
    s2 = spark.read.schema(SCHEMAS["supplier"]).orc(f"{tmp}/supplier_orc")
    return s2.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 6).alias("sum_acctbal"),
    )


@query(
    "src_kafka_roundtrip",
    group="sources",
    oracle=f"""
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id % 32) AS n_partitions
FROM (SELECT * FROM events) e
GROUP BY event_type
""",
)
def src_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka ingest seam, exercised without a broker: fixture events
    are encoded as Kafka-shaped records (binary JSON value, user_id
    partition key) and pushed through the real decode transform
    (from_json -> typed columns) — the exact DataFrame logic the
    streaming reader feeds.  The aggregate must match the raw events,
    proving the encode/decode round-trip is lossless; the reader
    builder itself (sources/kafka_stream.py) awaits a broker + jar."""
    from pg_telemetry_spark.sources.kafka_stream import (
        decode_events,
        fixture_as_kafka_records,
    )

    e = load_table(spark, sf_dir, "events")
    decoded = decode_events(fixture_as_kafka_records(e))
    return decoded.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.countDistinct("partition").alias("n_partitions"),
    )
