"""Temporal reads, nearest-neighbor time joins, percentile bands, and
the LATERAL SQL surface.

`wl_snapshot_asof` closes the SCD2 loop: history maintenance without
point-in-time reads is half a feature — the snapshot-as-of query is
what consumers actually run against a versioned dimension.
`join_asof_nearest` completes the as-of family (backward join_asof,
tolerance join_asof_tol, and now nearest-in-either-direction), using
the banded equi-join rewrite so no nested-loop appears."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "wl_snapshot_asof",
    group="workload",
    oracle="""
WITH versions AS (
  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice,
         1 AS version
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'U', round(o_totalprice * 1.1, 6), 2
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'X', round(o_totalprice * 1.2, 6), 3
  FROM orders WHERE o_orderkey % 20 = 0
), hist AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, version AS valid_from,
         coalesce(lead(version) OVER (PARTITION BY o_orderkey
                                      ORDER BY version) - 1, 999999) AS valid_to
  FROM versions
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS sum_totalprice
FROM hist
WHERE valid_from <= 2 AND valid_to >= 2
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def wl_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history: the
    snapshot "as of version 2" is the validity-range filter
    valid_from ≤ v ≤ valid_to — every key contributes exactly its
    one row that was live at that version.  The filter lands
    directly on the history frame (at warehouse scale: on the
    history TABLE, where [valid_from, valid_to] columns give
    row-group min/max pruning), so time travel costs a scan of the
    history slice, not a replay of the change log."""
    from pg_telemetry_spark.queries.dataeng import wl_scd2_history

    hist = wl_scd2_history(spark, sf_dir)
    return (
        hist.filter((F.col("valid_from") <= 2) & (F.col("valid_to") >= 2))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "join_asof_nearest",
    group="joins",
    tier="B",
    oracle=f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM {EVENTS_V} e WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id AS c_event_id, user_id, ts, value
  FROM {EVENTS_V} e WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, round(c.value, 6) AS nearest_value,
       round(abs(epoch(p.ts) - epoch(c.ts)), 6) AS nearest_dist_s
FROM purchases p
JOIN clicks c ON p.user_id = c.user_id
             AND abs(epoch(p.ts) - epoch(c.ts)) <= 1800
QUALIFY row_number() OVER (
  PARTITION BY p.event_id
  ORDER BY abs(epoch(p.ts) - epoch(c.ts)), c.ts, c.c_event_id) = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor time join (either direction, ±30 min): each
    purchase pairs with its temporally CLOSEST click.  Neither
    engine's ASOF join does bidirectional-nearest, so the oracle
    spells it as a QUALIFY rank and the Spark side uses the banded
    rewrite: both sides bucket ts into 30-min bands, the left
    explodes into its band ± 1 (every within-tolerance pair shares
    one of those bands), the join is pure (user, band) equi, and one
    rank window keeps the closest with full tie-breaks.  Each left
    row lands in exactly 3 buckets ⇒ candidate volume is ~3× band
    occupancy, never O(n·m); the plan is HashJoin + window, no bnlj."""
    e = load_table(spark, sf_dir, "events")
    tol = 1800
    ep = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", ep.alias("p_ep"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(tol * 1_000_000)).cast(
            "bigint"
        ).alias("p_band"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        "value",
        ep.alias("c_ep"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(tol * 1_000_000)).cast(
            "bigint"
        ).alias("c_band"),
    )
    probe = purchases.select(
        "*", F.explode(F.array(F.col("p_band") - 1, F.col("p_band"), F.col("p_band") + 1)).alias("band")
    )
    dist = F.abs(F.col("p_ep") - F.col("c_ep"))
    w = Window.partitionBy("event_id").orderBy(
        dist.asc(), F.col("c_ts").asc(), F.col("c_event_id").asc()
    )
    return (
        probe.join(
            clicks,
            (probe.user_id == clicks.c_user_id) & (F.col("band") == clicks.c_band),
        )
        .filter(dist <= tol)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("nearest_value"),
            F.round(dist, 6).alias("nearest_dist_s"),
        )
    )


@query(
    "ts_percentile_bands",
    group="timeseries",
    oracle=f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       CAST(count(*) AS BIGINT) AS n
FROM {EVENTS_V} e
GROUP BY date_trunc('hour', ts), event_type
ORDER BY bucket, event_type
""",
)
def ts_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly p50/p95 latency bands per series — THE telemetry
    dashboard query (the shaded band around every latency chart).
    Exact interpolating percentiles per (bucket, type) group: one
    shuffle on the group key, percentile state = per-group sorted
    values.  At 100 TB the exact form is for final rollups; the
    streaming path uses the approx_percentile sketch (agg_approx_pct)
    whose error bound is unit-tested — this pair documents the
    exact/approx trade explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.count("*").alias("n"),
        )
        .orderBy("bucket", "event_type")
    )


@query(
    "sql_lateral_topn",
    group="sql",
    oracle="""
SELECT d.c_mktsegment, l.o_orderkey, round(l.o_totalprice, 6) AS totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) d,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = d.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
  LIMIT 2
) l
ORDER BY d.c_mktsegment, totalprice DESC, l.o_orderkey
""",
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 orders per market
    segment) through the SQL front door — the modern spelling of
    per-group top-N that Catalyst decorrelates into a rank window
    over one join, NOT a per-group re-execution (DuckDB does the
    same rewrite, making it a fair two-engine surface).  At scale
    this plans identically to win_topn_group; the operator exists to
    pin that the SQL construct parses, decorrelates, and stays
    nested-loop-free."""
    for name in ("orders", "customer"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        SELECT d.c_mktsegment, l.o_orderkey,
               round(l.o_totalprice, 6) AS totalprice
        FROM (SELECT DISTINCT c_mktsegment FROM v_customer) d,
        LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_mktsegment = d.c_mktsegment
          ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
          LIMIT 2
        ) l
        ORDER BY d.c_mktsegment, totalprice DESC, l.o_orderkey
        """
    )
