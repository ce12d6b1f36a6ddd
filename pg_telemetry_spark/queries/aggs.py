"""Aggregation operators — SURVEY.md §2.4.

All shapes compile to Spark's two-phase HashAggregate (map-side
partial + reduce-side final), so the shuffle moves one row per
(partition, group), not per input row — the property that makes
low-cardinality telemetry rollups cheap at 100 TB.  Multi-distinct
uses Spark's Expand rewrite; grouping sets/rollup/cube use Expand too
(one input pass regardless of grouping-set count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.queries.detsum import DAVG_SQL, DSUM_SQL, davg, dsum
from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query(
    "agg_global",
    group="aggs",
    oracle="""
SELECT count(*) AS n_rows,
       round(sum(l_quantity), 6) AS sum_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(min(l_discount), 6) AS min_disc,
       round(max(l_tax), 6) AS max_tax,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over lineitem (single-row result)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.min("l_discount"), 6).alias("min_disc"),
        F.round(F.max("l_tax"), 6).alias("max_tax"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_group_hash",
    group="aggs",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {DSUM_SQL.format(x="l_quantity")} AS sum_qty,
       {DSUM_SQL.format(x="l_extendedprice")} AS sum_base_price,
       {DSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {DSUM_SQL.format(x="l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {DAVG_SQL.format(x="l_quantity")} AS avg_qty,
       {DAVG_SQL.format(x="l_extendedprice")} AS avg_price,
       {DAVG_SQL.format(x="l_discount")} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shape grouped aggregate (8 aggregate expressions).
    Money sums/means use the exact-decimal discipline
    (queries/detsum.py) so the hash match is order-independent and
    holds a decade above the sf0.01 gate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_distinct",
    group="aggs",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events
FROM {EVENTS_V} e
GROUP BY 1
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates + a plain one (Expand rewrite)."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


@query("agg_approx_cd", group="aggs", tier="C")
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event_type (approx ⇒ rows-only check;
    the unit test asserts within 5% of exact)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


@query(
    "agg_grouping_sets",
    group="aggs",
    oracle=f"""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM {EVENTS_V} e
GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((type),(day),()) in one input pass (Expand)."""
    e = _events(spark, sf_dir)
    e.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS timestamp_ntz) AS day,
               count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS sum_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
        """
    )


@query(
    "agg_rollup",
    group="aggs",
    oracle="""
SELECT r.r_name, n.n_name, c.c_mktsegment,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name, c.c_mktsegment)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region -> nation -> segment revenue."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name", "c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@query(
    "agg_cube",
    group="aggs",
    oracle=f"""
SELECT event_type,
       datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value
FROM {EVENTS_V} e
GROUP BY CUBE (event_type, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, day-of-week) — dow via explicit date arithmetic
    (Spark/DuckDB weekday numbering differs, so it is banned)."""
    e = _events(spark, sf_dir)
    dow = (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) % 7).alias(
        "dow"
    )
    return (
        e.select("event_type", dow, "value")
        .cube("event_type", "dow")
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


@query(
    "agg_filtered",
    group="aggs",
    oracle=f"""
SELECT event_type,
       count(*) AS n_total,
       count(*) FILTER (WHERE value > 100) AS n_big,
       count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
       round(coalesce(sum(value) FILTER (WHERE value > 100), 0.0), 6) AS sum_big
FROM {EVENTS_V} e
GROUP BY event_type
""",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group conditional aggregation (FILTER clause shape)."""
    e = _events(spark, sf_dir)
    big = F.col("value") > 100
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(big, 1).otherwise(0)).cast("long").alias("n_big"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).cast("long").alias(
            "n_even_user"
        ),
        F.round(F.coalesce(F.sum(F.when(big, F.col("value"))), F.lit(0.0)), 6).alias("sum_big"),
    )


@query(
    "agg_stats",
    group="aggs",
    oracle=f"""
SELECT event_type,
       round(stddev_samp(value), 6) AS sd_value,
       round(var_samp(value), 6) AS var_value,
       round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) + 0 AS corr_vk,
       round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) + 0
         AS covar_vk
FROM {EVENTS_V} e
GROUP BY event_type
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. correlation with a JSON-extracted
    property (single-pass co-moment computation)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    return e.select("event_type", "value", k.alias("k")).groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr("value", "k"), 6).alias("corr_vk"),
        F.round(F.covar_samp("value", "k"), 6).alias("covar_vk"),
    )


@query(
    "agg_percentile",
    group="aggs",
    oracle=f"""
SELECT event_type,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM {EVENTS_V} e
GROUP BY event_type
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles (matches quantile_cont)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "agg_collect",
    group="aggs",
    oracle=f"""
SELECT user_id,
       array_to_string(list_sort(list(event_type)), ',') AS types
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-03'
GROUP BY user_id
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array, sorted for determinism, joined to a single
    string — a scalar the result canonicalizer can hash/sort (raw
    array<string> cells are unhashable driver-side)."""
    e = _events(spark, sf_dir).filter(F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("types")
    )


@query(
    "agg_minmax_by",
    group="aggs",
    oracle=f"""
SELECT user_id, event_type,
       arg_max(value, ts) AS last_value,
       arg_min(value, ts) AS first_value,
       max(ts) AS last_ts
FROM {EVENTS_V} e
GROUP BY user_id, event_type
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-point query — latest/earliest value per series (max_by)."""
    e = _events(spark, sf_dir)
    return e.groupBy("user_id", "event_type").agg(
        F.max_by("value", "ts").alias("last_value"),
        F.min_by("value", "ts").alias("first_value"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "agg_bool",
    group="aggs",
    oracle=f"""
SELECT event_type,
       count(*) FILTER (WHERE value > 300) AS n_gt300,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 327) AS any_huge
FROM {EVENTS_V} e
GROUP BY event_type
""",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 300).alias("n_gt300"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 327).alias("any_huge"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    group="aggs",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM {EVENTS_V} e
GROUP BY 1
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type -> columns (fixed value list avoids the extra
    distinct-values job — mandatory at scale)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


@query(
    "agg_unpivot",
    group="aggs",
    oracle=f"""
WITH wide AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'error') AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase
  FROM {EVENTS_V} e
  GROUP BY 1
)
SELECT day, kind, n FROM wide
UNPIVOT (n FOR kind IN (click, error, purchase))
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-day type counts back to long form —
    the inverse of agg_pivot, a pure narrow Expand (no shuffle)."""
    e = _events(spark, sf_dir)
    wide = (
        e.filter(F.col("event_type").isin("click", "error", "purchase"))
        .groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"))
        .pivot("event_type", ["click", "error", "purchase"])
        .count()
        .na.fill(0)
    )
    return wide.unpivot("day", ["click", "error", "purchase"], "kind", "n")


@query(
    "win_nth_value",
    group="windows",
    oracle=f"""
SELECT user_id, event_id,
       nth_value(value, 2) OVER w AS second_value,
       first_value(event_id) OVER w AS first_event
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-03'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value in a cumulative frame (null until the frame holds n
    rows) + first_value anchor."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir).filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.first("event_id").over(w).alias("first_event"),
    )


@query(
    "agg_histogram",
    group="aggs",
    oracle=f"""
SELECT CAST(floor(value / 25) * 25 AS DOUBLE) AS bucket_lo,
       count(*) AS n,
       round(avg(value), 6) AS avg_in_bucket
FROM {EVENTS_V} e
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram via arithmetic bucketing."""
    e = _events(spark, sf_dir)
    return (
        e.withColumn("bucket_lo", (F.floor(F.col("value") / 25) * 25).cast("double"))
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_in_bucket"))
    )


@query("agg_hll_rollup", group="aggs", tier="C")
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the telemetry MV primitive: per-day
    HLL sketches of distinct users (DataSketches binary, stored beside
    the daily rollup at scale) are UNIONED across days to answer the
    monthly distinct without touching raw data.  Re-aggregability is
    what approx_count_distinct's scalar output cannot give you; the
    unit test bounds the merged estimate against exact and against the
    single-pass sketch."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users_merged"),
        F.sum("n_events").alias("n_events"),
    )
