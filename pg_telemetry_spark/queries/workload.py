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


@query(
    "wl_q4_order_priority",
    group="workload",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def wl_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: fixture lineitem has no commit/receipt
    dates, so "late" = shipped >60 days after order date): order counts
    per priority for one quarter where at least one line shipped late.
    EXISTS -> left-semi join; the orders-side date filter prunes the
    scan before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "wl_q14_promo_revenue",
    group="workload",
    oracle="""
SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_pct,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01'
""",
)
def wl_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month.  The
    part dim broadcasts (never more than ~millions of rows even at
    100 TB lineitem), so the filtered lineitem slice never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            # exact-decimal sums (queries/detsum.py): the double sums
            # broke the hash at the sf1 sweep
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(0.0)
                    .cast("decimal(18,6)")
                ).cast("double")
                / F.sum(rev.cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("promo_pct"),
            F.round(F.sum(rev.cast("decimal(18,6)")).cast("double"), 6).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "wl_q18_large_orders",
    group="workload",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 6) AS totalprice,
       round(sum(l.l_quantity), 6) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey ASC
LIMIT 20
""",
)
def wl_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds 300.  The HAVING subquery becomes an aggregated semi-side
    frame joined on the orderkey — the aggregate output is tiny (keys
    surviving HAVING), so AQE converts that join to broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 6).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "wl_q6_revenue_delta",
    group="workload",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 6) AS promo_revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def wl_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical scan-and-aggregate — every
    predicate (date band, discount band, quantity cap) pushes to the
    parquet reader and the plan is a single whole-stage-codegen scan
    with a partial+final agg, zero joins, zero wide shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
            "promo_revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "wl_q2_min_price",
    group="workload",
    oracle="""
SELECT p.p_partkey, p.p_name, p.p_size, round(p.p_retailprice, 6) AS retailprice
FROM part p
WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                         WHERE p2.p_size = p.p_size)
ORDER BY p.p_size ASC, p.p_partkey ASC
""",
)
def wl_q2_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: fixtures carry no partsupp, so the
    correlated min moves to part itself): parts priced at the minimum
    retail price of their size class.  The correlated scalar subquery
    decorrelates into a window min over p_size — one shuffle on the
    correlation key instead of a per-row subquery."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_size")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            F.round("p_retailprice", 6).alias("retailprice"),
        )
        .orderBy(F.col("p_size").asc(), F.col("p_partkey").asc())
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


@query(
    "wl_upsert_scd1",
    group="workload",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         round(o_totalprice * 1.1, 6) AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
         round(o_totalprice, 6), 2 AS version
  FROM orders WHERE o_orderkey % 97 = 0
), unioned AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         round(o_totalprice, 6) AS o_totalprice, 1 AS version
  FROM orders
  UNION ALL SELECT * FROM changes
), latest AS (
  SELECT * FROM unioned
  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
)
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_totalprice
FROM latest GROUP BY o_orderstatus
""",
)
def wl_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot upsert (SCD-1 / last-writer-wins MERGE): a change
    batch (10% updates + new keys) applied over the base table by
    versioned row_number — the lakehouse-format-free formulation of
    MERGE INTO.  One shuffle on the merge key; at 100 TB the base is
    bucketed on that key so only the (small) change batch moves."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 6).alias("o_totalprice"), F.lit(1).alias("version"),
    )
    updates = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey", "o_custkey", F.lit("U").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 1.1, 6).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    inserts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_custkey", F.lit("N").alias("o_orderstatus"),
            F.round("o_totalprice", 6).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    unioned = o.unionByName(updates).unionByName(inserts)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    latest = unioned.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        # round-2, not 6: the sum is ~4e8, so the 6th decimal sits at
        # double's precision edge where summation order wobbles
        F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
    )


@query(
    "wl_salted_join",
    group="workload",
    oracle=f"""
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS type_weight
  FROM {EVENTS_V} e
)
SELECT e.event_type, count(*) AS n_events,
       round(CAST(sum(CAST(e.value * d.type_weight AS DECIMAL(18,6)))
                  AS DOUBLE), 6) + 0 AS weighted_sum
FROM {EVENTS_V} e JOIN dim d USING (event_type)
GROUP BY e.event_type
""",
)
def wl_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join proven exact: events (5 event types — a
    maximally hot join key) join a per-type dim via salt-and-explode,
    and the result must equal the plain join (the oracle IS the
    unsalted formulation).  The salt spreads each hot key across 16
    partitions; the dim replicates 16× — the trade that beats one
    straggling reducer when the hot side is 100 TB and AQE's split
    granularity isn't enough."""
    from pg_telemetry_spark.operators.skew import salted_join_small

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    joined = salted_join_small(e, dim, key="event_type", unique_col="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        (
            F.round(
                F.sum(
                    (F.col("value") * F.col("type_weight")).cast("decimal(18,6)")
                ).cast("double"),
                6,
            )
            + 0.0
        ).alias("weighted_sum"),
    )


@query(
    "wl_markov_transition",
    group="workload",
    oracle="""
WITH p AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), t AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM p WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
), tot AS (
  SELECT prev_type, sum(n) AS tn FROM t GROUP BY prev_type
)
SELECT t.prev_type, t.next_type, t.n,
       round(CAST(t.n AS DOUBLE) / tot.tn, 6) AS prob
FROM t JOIN tot USING (prev_type)
""",
)
def wl_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | previous event type), the standard
    model behind next-action prediction, funnel leak detection, and
    session-path anomaly scoring.

    Determinism: consecutive pairs order by (ts, event_id) — the
    event_id tiebreak makes the lag identical in both engines even
    when timestamps collide.  Shape at 100 TB: one shuffle on
    user_id for the lag window (users are independent series — no
    global window), then a hash agg onto the O(types^2) transition
    matrix; the row-count denominator joins back as a broadcast of
    O(types) rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = p.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    return t.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("tn"), 6).alias("prob"),
    )


@query(
    "wl_cohort_ltv",
    group="workload",
    oracle="""
WITH first_m AS (
  SELECT o_custkey,
         min(CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
             + CAST(extract(month FROM o_orderdate) AS BIGINT)) AS cohort_m
  FROM orders GROUP BY o_custkey
), aged AS (
  SELECT f.cohort_m,
         (CAST(extract(year FROM o.o_orderdate) AS BIGINT) * 12
          + CAST(extract(month FROM o.o_orderdate) AS BIGINT)) - f.cohort_m
           AS age_months,
         o.o_custkey, o.o_totalprice
  FROM orders o JOIN first_m f ON o.o_custkey = f.o_custkey
), per AS (
  SELECT cohort_m, age_months,
         count(DISTINCT o_custkey) AS n_active,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM aged WHERE age_months < 6 GROUP BY cohort_m, age_months
)
SELECT cohort_m, age_months, n_active,
       round(rev, 2) AS revenue,
       round(CAST(sum(CAST(rev AS DECIMAL(18,6)))
                  OVER (PARTITION BY cohort_m ORDER BY age_months)
             AS DOUBLE), 2) AS cum_revenue
FROM per
""",
)
def wl_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month (integer year*12+month — engine-independent month
    arithmetic, no months_between fractions), revenue per cohort-age
    for the first 6 months, with the running cumulative LTV per
    cohort.  The analytics query every subscription/commerce
    dashboard runs.

    Scale shape: first-order month is one groupBy(custkey) min; the
    age tag joins it back on the customer key (at 100 TB both sides
    hash-partition on custkey — co-located); per-(cohort, age) agg is
    decimal-exact (detsum), and the cumulative window runs over the
    TINY per-cohort result (80 cohorts x 6 ages), not raw orders."""
    o = load_table(spark, sf_dir, "orders")
    om = (F.year("o_orderdate").cast("bigint") * 12 + F.month("o_orderdate")).alias(
        "om"
    )
    first_m = (
        o.select("o_custkey", om)
        .groupBy("o_custkey")
        .agg(F.min("om").alias("cohort_m"))
    )
    aged = (
        o.select("o_custkey", "o_totalprice", om)
        .join(first_m, "o_custkey")
        .select(
            "cohort_m",
            (F.col("om") - F.col("cohort_m")).alias("age_months"),
            "o_custkey",
            "o_totalprice",
        )
        .filter(F.col("age_months") < 6)
    )
    per = aged.groupBy("cohort_m", "age_months").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev"),
    )
    w = Window.partitionBy("cohort_m").orderBy("age_months")
    return per.select(
        "cohort_m",
        "age_months",
        "n_active",
        # 2-dp (cents) rounding: cohort cumulative revenue reaches
        # ~4e9 at sf1, where 6 decimals needs 16 significant digits —
        # past double precision, so engine round() results diverge by
        # an ulp (caught by the on-landing sf1 sweep); 2 dp is 12-13
        # digits, inside the exact range
        F.round("rev", 2).alias("revenue"),
        F.round(
            F.sum(F.col("rev").cast("decimal(18,6)")).over(w).cast("double"), 2
        ).alias("cum_revenue"),
    )


@query(
    "wl_new_vs_returning",
    group="workload",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM {EVENTS_V} e GROUP BY user_id
), daily AS (
  SELECT CAST(e.ts AS DATE) AS day, e.user_id, f.first_day
  FROM {EVENTS_V} e JOIN firsts f ON e.user_id = f.user_id
  GROUP BY 1, 2, 3
)
SELECT day,
       count(*) AS n_active,
       count(*) FILTER (WHERE day = first_day) AS n_new,
       count(*) FILTER (WHERE day > first_day) AS n_returning,
       round(CAST(count(*) FILTER (WHERE day > first_day) AS DOUBLE)
             / count(*), 6) AS returning_rate
FROM daily GROUP BY day
""",
)
def wl_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the first activation chart
    on every growth dashboard: a user is 'new' on their first-seen
    day, 'returning' on any later active day.

    Scale shape: first-seen is one groupBy(user) min; daily active
    pairs dedupe on (day, user); the classification join is user-key
    co-partitioned with the first-seen table (at 100 TB both sides
    hash-partition on user_id — no broadcast needed, no window); the
    final agg is day-cardinality."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = (
        e.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .join(firsts, "user_id")
    )
    ret = F.count_if(F.col("day") > F.col("first_day"))
    return daily.groupBy("day").agg(
        F.count("*").alias("n_active"),
        F.count_if(F.col("day") == F.col("first_day")).alias("n_new"),
        ret.alias("n_returning"),
        F.round(ret.cast("double") / F.count("*"), 6).alias("returning_rate"),
    )
