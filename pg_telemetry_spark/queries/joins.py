"""Join operators — SURVEY.md §2.3.

Scale notes baked into each shape:

- big ⋈ big equi-joins (orders⋈customer, lineitem⋈orders) are left to
  the planner: sort-merge or shuffled-hash on the key, AQE-coalesced.
- dimension joins broadcast explicitly (``F.broadcast``): nation and
  region are tiny at ANY scale factor, so a 5-way star join moves the
  fact table exactly once.
- non-equi time joins (theta/interval) are rewritten into *banded*
  equi-joins: bucket both sides by ``floor(epoch / band)``, explode
  one side to neighboring buckets, equi-join on (key, bucket), then
  re-apply the exact predicate.  This turns what the planner would
  execute as BroadcastNestedLoopJoin (O(n·m), a non-starter at 100 TB)
  into a hash-partitioned join whose cost is proportional to true
  match density.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.queries.detsum import dsum
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "join_inner_hash",
    group="joins",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment, round(o.o_totalprice, 6) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
""",
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer (planner picks SMJ/SHJ; AQE may
    downgrade to broadcast when the filtered side is small)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", F.round("o_totalprice", 6).alias("total")
    )


@query(
    "join_broadcast",
    group="joins",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS n_customers,
       round(sum(c.c_acctbal), 6) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim joins with explicit broadcast — no shuffle of the fact side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("sum_acctbal"),
        )
    )


@query(
    "join_multiway",
    group="joins",
    oracle="""
SELECT r.r_name, n.n_name,
       count(*) AS n_items,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY r.r_name, n.n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: fact⋈fact on keys, tiny dims broadcast; the
    fact table is shuffled once (on l_orderkey), then stays local."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_left",
    group="joins",
    oracle="""
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey) AS n_f_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 6) AS f_total
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F'
           AND o_orderdate >= TIMESTAMP '1998-01-01') o
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-extension: customers keep a row even
    with zero matching orders (count of nulls = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_f_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6).alias("f_total"),
        )
    )


@query(
    "join_right",
    group="joins",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, round(o.o_totalprice, 6) AS total
FROM (SELECT * FROM orders WHERE o_totalprice > 350000) o
RIGHT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
  ON o.o_custkey = c.c_custkey
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every BUILDING customer survives; order side
    null-extended where no big order exists."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_mktsegment", "o_orderkey", F.round("o_totalprice", 6).alias("total")
    )


@query(
    "join_full",
    group="joins",
    oracle=f"""
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       a.n_first, b.n_second
FROM (SELECT user_id, count(*) AS n_first FROM {EVENTS_V} e
      WHERE ts < TIMESTAMP '2024-01-16' AND event_type = 'purchase'
      GROUP BY user_id) a
FULL JOIN (SELECT user_id, count(*) AS n_second FROM {EVENTS_V} e
      WHERE ts >= TIMESTAMP '2024-01-16' AND event_type = 'purchase'
      GROUP BY user_id) b
  ON a.user_id = b.user_id
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-half purchase counts (nulls both ways)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    a = (
        e.filter(F.col("ts") < cut)
        .groupBy(F.col("user_id").alias("uid_a"))
        .agg(F.count("*").alias("n_first"))
    )
    b = (
        e.filter(F.col("ts") >= cut)
        .groupBy(F.col("user_id").alias("uid_b"))
        .agg(F.count("*").alias("n_second"))
    )
    return a.join(b, a.uid_a == b.uid_b, "full").select(
        F.coalesce(F.col("uid_a"), F.col("uid_b")).alias("user_id"), "n_first", "n_second"
    )


@query(
    "join_semi",
    group="joins",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join (no row multiplication, build side
    deduped by the planner)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 300000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    group="joins",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (threshold chosen so the result is
    non-empty on the fixtures — an empty result would verify nothing)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


def banded_self_pairs(events: DataFrame, band_seconds: int) -> DataFrame:
    """Banded rewrite of the |t1−t2| < band self-join.

    Each left row explodes to its bucket and both neighbors; the right
    side keeps its single bucket; the equi-join on (user_id, bucket)
    hash-partitions, and the exact predicate re-filters.  Each true
    pair matches exactly once (the right row's one bucket falls in the
    left row's three).  Cost ~ O(pairs), not O(n²) — this is the 100 TB
    path for time-window correlation.
    """
    base = events.select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.col("ts").alias("ets"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)).alias("epoch"),
    ).withColumn("bucket", F.floor(F.col("epoch") / band_seconds))
    left = base.withColumn(
        "jbucket", F.explode(F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1))
    )
    right = (
        base.withColumnRenamed("eid", "eid2")
        .withColumnRenamed("ets", "ets2")
        .withColumnRenamed("epoch", "epoch2")
        .withColumnRenamed("bucket", "jbucket")
    )
    return (
        left.join(right, ["user_id", "jbucket"])
        .filter(
            (F.col("eid") < F.col("eid2"))
            & (F.abs(F.col("epoch") - F.col("epoch2")) < band_seconds)
        )
    )


@query(
    "join_theta_range",
    group="joins",
    oracle=f"""
SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
       round(abs(epoch(b.ts) - epoch(a.ts)), 6) AS gap_seconds
FROM {EVENTS_V} a JOIN {EVENTS_V} b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch(b.ts) - epoch(a.ts)) < 300
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join (same user within 5 min) via banded rewrite."""
    e = load_table(spark, sf_dir, "events")
    pairs = banded_self_pairs(e, 300)
    return pairs.select(
        "user_id",
        F.col("eid").alias("id1"),
        F.col("eid2").alias("id2"),
        F.round(F.abs(F.col("epoch2") - F.col("epoch")), 6).alias("gap_seconds"),
    )


@query(
    "join_interval",
    group="joins",
    oracle=f"""
SELECT s.event_id AS signup_id, s.user_id,
       count(e.event_id) AS n_follow,
       round(coalesce(sum(e.value), 0.0), 6) AS follow_value
FROM (SELECT * FROM {EVENTS_V} e WHERE event_type = 'signup') s
LEFT JOIN {EVENTS_V} e
  ON e.user_id = s.user_id
 AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
 AND e.event_id <> s.event_id
GROUP BY s.event_id, s.user_id
""",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: activity within 1 h after each signup.

    Banded equi-rewrite (1 h buckets): interval start bucket b matches
    events in buckets {b, b+1}; exact predicate re-filters; left join
    semantics recovered by aggregating over the signup side."""
    e = load_table(spark, sf_dir, "events")
    band = 3600
    epoch = (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)).alias("epoch")
    base = e.select("user_id", "event_id", "event_type", "ts", "value", epoch).withColumn(
        "bucket", F.floor(F.col("epoch") / band)
    )
    signups = (
        base.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            F.col("epoch").alias("s_epoch"),
            "bucket",
        )
        .withColumn("jbucket", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)))
    )
    follows = base.select(
        "user_id",
        F.col("event_id").alias("f_id"),
        F.col("epoch").alias("f_epoch"),
        F.col("value").alias("f_value"),
        F.col("bucket").alias("jbucket"),
    )
    matched = signups.join(follows, ["user_id", "jbucket"]).filter(
        (F.col("f_epoch") >= F.col("s_epoch"))
        & (F.col("f_epoch") < F.col("s_epoch") + band)
        & (F.col("f_id") != F.col("signup_id"))
    )
    # left-join semantics: re-attach signups with no follow-up
    agg = matched.groupBy("signup_id", "user_id").agg(
        F.count("f_id").alias("n_follow"),
        F.round(F.sum("f_value"), 6).alias("follow_value"),
    )
    all_signups = signups.select("signup_id", "user_id").distinct()
    return all_signups.join(agg, ["signup_id", "user_id"], "left").select(
        "signup_id",
        "user_id",
        F.coalesce(F.col("n_follow"), F.lit(0)).alias("n_follow"),
        F.round(F.coalesce(F.col("follow_value"), F.lit(0.0)), 6).alias("follow_value"),
    )


@query(
    "join_cross",
    group="joins",
    oracle="""
SELECT r.r_name, p.o_orderpriority
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian grid of two tiny dims (25 rows) — explicit crossJoin."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    p = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


@query(
    "join_self_consec",
    group="joins",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM {EVENTS_V} e
)
SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
       round(epoch(b.ts) - epoch(a.ts), 6) AS gap_seconds
FROM numbered a JOIN numbered b
  ON a.user_id = b.user_id AND b.rn = a.rn + 1
""",
)
def join_self_consec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-event pairing via numbered self-join (the join
    formulation that win_lag_delta must agree with)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = e.select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)).alias("epoch"),
    ).withColumn("rn", F.row_number().over(w))
    a = numbered.alias("a")
    b = numbered.alias("b")
    return a.join(
        b, (F.col("a.user_id") == F.col("b.user_id")) & (F.col("b.rn") == F.col("a.rn") + 1)
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("id1"),
        F.col("b.event_id").alias("id2"),
        F.round(F.col("b.epoch") - F.col("a.epoch"), 6).alias("gap_seconds"),
    )
