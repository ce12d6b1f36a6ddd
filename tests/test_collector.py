"""End-to-end collector pipeline test: land files -> stream ->
warehouse -> query surface, with replay idempotence and retention."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from pg_telemetry_spark.collector import COLLECT_SCHEMA, TelemetryCollector
from pg_telemetry_spark.queries.streaming_ops import _day_batches, _stream_events
from pg_telemetry_spark.warehouse.layout import drop_partitions_older_than


def test_collector_end_to_end(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="pgts_collector_")
    events = _stream_events(spark, sf_dir)
    day1, day2, day3 = _day_batches(
        events, ["2024-01-01", "2024-01-02", "2024-01-03"]
    )
    c = TelemetryCollector(
        spark,
        landing_dir=f"{base}/landing",
        warehouse_dir=f"{base}/warehouse",
        checkpoint_dir=f"{base}/ckpt",
    )

    # tick 1: two days land
    import pathlib

    pathlib.Path(f"{base}/landing").mkdir(parents=True)
    day1.coalesce(1).write.mode("append").parquet(f"{base}/landing")
    day2.coalesce(1).write.mode("append").parquet(f"{base}/landing")
    c.run_available()
    # tick 2: nothing new — replay must not duplicate
    c.run_available()
    # tick 3: day 3 lands
    day3.coalesce(1).write.mode("append").parquet(f"{base}/landing")
    c.run_available()

    expected_total = day1.count() + day2.count() + day3.count()
    assert c.raw().count() == expected_total

    # the rollup-served hourly series equals a direct aggregation of raw
    direct = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value)
        for r in c.raw()
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .collect()
    }
    served = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value)
        for r in c.hourly_series().collect()
    }
    assert served == direct

    # time-sliced warehouse read prunes to one partition and matches
    one_day = c.raw().filter(F.col("event_date") == "2024-01-02")
    assert one_day.count() == day2.count()

    # retention: drop day 1 from every batch dir
    import pathlib as pl

    dropped = 0
    for bdir in pl.Path(f"{base}/warehouse/raw").glob("batch_id=*"):
        dropped += drop_partitions_older_than(spark, str(bdir), "2024-01-02")
    assert dropped >= 1
    assert c.raw().count() == expected_total - day1.count()


def test_stat_view_collector_statements_end_to_end(spark, sf_dir):
    """Typed pg_stat_statements landing -> raw + cross-batch
    increase() rollup: batch boundaries must not lose or double-count
    increases, replays must be idempotent, and counter resets (the
    derivation wraps its cumulative counters) must contribute the
    post-reset level."""
    import pathlib
    import tempfile

    from pg_telemetry_spark.collector import StatViewCollector, counter_increases
    from pg_telemetry_spark.statviews import derive_stat_statements
    from pg_telemetry_spark.tables import load_table

    base = tempfile.mkdtemp(prefix="pgts_statview_")
    snaps = derive_stat_statements(load_table(spark, sf_dir, "events")).persist()
    days = sorted(
        r[0].isoformat()
        for r in snaps.select(F.col("snap_ts").cast("date")).distinct().collect()
    )
    assert len(days) >= 2, "fixture must span >= 2 days"
    cut = days[len(days) // 2]

    c = StatViewCollector(
        spark,
        view="pg_stat_statements",
        landing_dir=f"{base}/landing",
        warehouse_dir=f"{base}/warehouse",
        checkpoint_dir=f"{base}/ckpt",
    )
    pathlib.Path(f"{base}/landing").mkdir(parents=True)

    first = snaps.filter(F.col("snap_ts").cast("date") < cut)
    second = snaps.filter(F.col("snap_ts").cast("date") >= cut)
    first.coalesce(1).write.mode("append").parquet(f"{base}/landing")
    c.run_available()
    c.run_available()  # replay: nothing new, must not duplicate
    second.coalesce(1).write.mode("append").parquet(f"{base}/landing")
    c.run_available()

    assert c.raw().count() == snaps.count()

    # the batched rollup equals one direct pass over ALL snapshots —
    # cross-batch continuity + reset rule in one equality
    keycols = ("snap_ts", "queryid")
    direct = {
        tuple(r[k] for k in keycols): (r.calls_inc, round(r.total_exec_time_inc, 6))
        for r in counter_increases(
            snaps, ["queryid"], ["calls", "total_exec_time", "rows"]
        ).collect()
    }
    served = {
        tuple(r[k] for k in keycols): (r.calls_inc, round(r.total_exec_time_inc, 6))
        for r in c.increases().collect()
    }
    assert served == direct
    # the wrap in the derivation guarantees at least one reset at
    # sf0.01+; the reset tick's increase must be the post-reset level
    # (never negative)
    assert all(v[0] >= 0 for v in direct.values())
    snaps.unpersist()
