"""Composite workload queries — realistic end-to-end shapes.

TPC-H-style analytics adapted to the fixture star schema (wl_q3/q5/
q10 shapes), the telemetry counter-rate rollup every dashboard runs,
a skew-salted aggregation proven identical to its unsalted oracle,
and an approximate-quantile rollup (tier C, error-bound tested).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.operators.skew import salted_agg
from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "wl_q3_shipping_priority",
    group="workload",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
)
def wl_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped high-revenue orders for one segment.
    Plan: segment filter prunes customers early, both joins shuffle on
    the orderkey/custkey, top-10 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "wl_q5_local_supplier",
    group="workload",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def wl_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where supplier and customer share a
    nation, one region, one year.  The supplier join carries the
    extra non-key equality (s_nationkey = c_nationkey) — still an
    equi-join, so still hash-partitionable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
    )


@query(
    "wl_q10_returned_items",
    group="workload",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       n.n_name, round(c.c_acctbal, 6) AS acctbal
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def wl_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-item revenue in a
    quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "n_name",
            F.round("c_acctbal", 6).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "wl_rate_hourly",
    group="workload",
    oracle=f"""
WITH deltas AS (
  SELECT user_id, event_type, ts,
         (value - lag(value) OVER w) /
           nullif(epoch(ts) - epoch(lag(ts) OVER w), 0) AS rate
  FROM {EVENTS_V} e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
       count(rate) AS n_rates,
       round(avg(greatest(rate, 0)), 6) + 0 AS avg_rate_nonneg
FROM deltas
WHERE rate IS NOT NULL
GROUP BY 1, 2
""",
)
def wl_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The telemetry dashboard composite: per-series counter rate
    (lag delta / elapsed, reset-guarded) rolled up to hourly averages
    per event type — window over the series shuffle, then a tiny
    bucket aggregation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    deltas = e.select(
        "ts",
        "event_type",
        (
            (F.col("value") - F.lag("value").over(w))
            / F.nullif(epoch - F.lag(epoch).over(w), F.lit(0.0))
        ).alias("rate"),
    ).filter(F.col("rate").isNotNull())
    return deltas.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"), "event_type"
    ).agg(
        F.count("rate").alias("n_rates"),
        (F.round(F.avg(F.greatest(F.col("rate"), F.lit(0.0))), 6) + 0.0).alias(
            "avg_rate_nonneg"
        ),
    )


@query(
    "wl_salted_agg",
    group="workload",
    oracle=f"""
SELECT event_type,
       count(*) AS count_events,
       round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM {EVENTS_V} e
GROUP BY event_type
""",
)
def wl_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation — exactly equal to the
    plain groupBy (the oracle IS the unsalted formulation), proving
    the salt/recombine decomposition.  event_type has only 5 values —
    precisely the hot-key shape that melts a reducer at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "count_events": F.count("*"),
            "sum_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        unique_col="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("count_events").cast("long").alias("count_events"),
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@query("agg_approx_pct", group="workload", tier="C")
def agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) p50/p95 per event_type —
    approx ⇒ rows-only; the unit test bounds the error vs exact."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("p95_approx"),
    )
