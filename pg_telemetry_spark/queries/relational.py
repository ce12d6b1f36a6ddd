"""Relational core — projection/filter/conditionals, sorts, set ops.

SURVEY.md §2.2 (proj_select, filt_pred, cond_expr, filt_ts_range),
§2.6 (sort_multi, topk_limit), §2.7 (set_*).  All pure built-in
DataFrame ops — filters and projections push into the Parquet scan;
global sorts are range-partitioned exchanges; top-k compiles to
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

#: Oracle-side events relation with the ns->us timestamp normalization.
EVENTS_V = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events)"
)


@query(
    "proj_select",
    group="relational",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty,
       round(l_extendedprice * (1 - l_discount), 6) AS revenue,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
""",
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with renames and computed columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("charge"),
    )


@query(
    "filt_pred",
    group="relational",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
FROM lineitem
WHERE (l_quantity BETWEEN 10 AND 20
       AND l_returnflag IN ('A', 'R')
       AND NOT (l_discount < 0.02)
       AND l_shipdate IS NOT NULL)
   OR (l_linestatus = 'O' AND l_quantity > 49 AND l_tax <= 0.01)
""",
)
def filt_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/disjunction, BETWEEN, IN, NOT, IS NOT NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & ~(F.col("l_discount") < 0.02)
            & F.col("l_shipdate").isNotNull()
        )
        | ((F.col("l_linestatus") == "O") & (F.col("l_quantity") > 49) & (F.col("l_tax") <= 0.01))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


@query(
    "cond_expr",
    group="relational",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_class,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       round(least(o_totalprice, 200000.0), 6) AS capped,
       round(greatest(o_totalprice - 100000.0, 0.0), 6) AS excess
FROM orders
""",
)
def cond_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder, coalesce/nullif, least/greatest."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.round(F.least(F.col("o_totalprice"), F.lit(200000.0)), 6).alias("capped"),
        F.round(F.greatest(F.col("o_totalprice") - 100000.0, F.lit(0.0)), 6).alias("excess"),
    )


@query(
    "filt_ts_range",
    group="relational",
    oracle=f"""
SELECT event_id, ts, user_id, event_type, value
FROM {EVENTS_V} e
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
""",
)
def filt_ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-slice of events — the tsdb hot path.  Uses the sliced
    loader so the bounds push down to the Parquet scan as raw
    nanosecond-long comparisons (row-group min/max pruning); a filter
    on the converted timestamp would never prune."""
    from pg_telemetry_spark.tables import load_events_sliced

    e = load_events_sliced(spark, sf_dir, "2024-01-10", "2024-01-12")
    return e.select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "sort_multi",
    group="relational",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       row_number() OVER (ORDER BY o_orderpriority DESC, o_totalprice ASC, o_orderkey ASC)
         AS sort_rank
FROM orders
WHERE o_orderstatus = 'F'
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key mixed-direction sort, proven via a rank column
    (the driver's hash is order-insensitive, so the order is
    materialized as a value)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.orderBy(
        F.col("o_orderpriority").desc(), F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("sort_rank", F.row_number().over(w))
        .orderBy("sort_rank")
    )


@query(
    "topk_limit",
    group="relational",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15
""",
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-by + limit -> TakeOrderedAndProject (heap top-k per
    partition + driver merge; never a global sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("total"))
        .orderBy(F.col("total").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


def _half(events: DataFrame, first: bool) -> DataFrame:
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    return events.filter(F.col("ts") < cut if first else F.col("ts") >= cut)


_H1 = f"(SELECT * FROM {EVENTS_V} e WHERE ts <  TIMESTAMP '2024-01-16')"
_H2 = f"(SELECT * FROM {EVENTS_V} e WHERE ts >= TIMESTAMP '2024-01-16')"


@query(
    "set_union_all",
    group="setops",
    oracle=f"""
SELECT user_id, event_type FROM {_H1} h1 WHERE event_type = 'error'
UNION ALL
SELECT user_id, event_type FROM {_H2} h2 WHERE event_type IN ('error', 'purchase')
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two event slices (no dedup shuffle)."""
    e = load_table(spark, sf_dir, "events")
    a = _half(e, True).filter(F.col("event_type") == "error").select("user_id", "event_type")
    b = (
        _half(e, False)
        .filter(F.col("event_type").isin("error", "purchase"))
        .select("user_id", "event_type")
    )
    return a.unionByName(b)


@query(
    "set_union_dist",
    group="setops",
    oracle=f"""
SELECT user_id, event_type FROM {_H1} h1
UNION
SELECT user_id, event_type FROM {_H2} h2
""",
)
def set_union_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup across both inputs)."""
    e = load_table(spark, sf_dir, "events")
    a = _half(e, True).select("user_id", "event_type")
    b = _half(e, False).select("user_id", "event_type")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    group="setops",
    oracle=f"""
SELECT user_id, event_type FROM {_H1} h1
INTERSECT
SELECT user_id, event_type FROM {_H2} h2
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, type) pairs active in both halves of the month."""
    e = load_table(spark, sf_dir, "events")
    return (
        _half(e, True)
        .select("user_id", "event_type")
        .intersect(_half(e, False).select("user_id", "event_type"))
    )


@query(
    "set_except",
    group="setops",
    oracle=f"""
SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM {_H1} h1
EXCEPT
SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM {_H2} h2
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, prop-k) pairs seen only in the first half (set semantics;
    the finer grain keeps the result non-empty on the fixtures)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long").alias("k")
    return (
        _half(e, True)
        .select("user_id", k)
        .subtract(_half(e, False).select("user_id", k))
    )


@query(
    "set_intersect_all",
    group="setops",
    oracle=f"""
SELECT user_id, event_type FROM {_H1} h1
INTERSECT ALL
SELECT user_id, event_type FROM {_H2} h2
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection: min(multiplicity) copies survive."""
    e = load_table(spark, sf_dir, "events")
    return (
        _half(e, True)
        .select("user_id", "event_type")
        .intersectAll(_half(e, False).select("user_id", "event_type"))
    )


@query(
    "set_except_all",
    group="setops",
    oracle=f"""
SELECT user_id, event_type FROM {_H1} h1
EXCEPT ALL
SELECT user_id, event_type FROM {_H2} h2
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicities subtract."""
    e = load_table(spark, sf_dir, "events")
    return (
        _half(e, True)
        .select("user_id", "event_type")
        .exceptAll(_half(e, False).select("user_id", "event_type"))
    )


@query(
    "proj_explode_outer",
    group="relational",
    oracle="""
SELECT d.doc_id, t.tok
FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 7) AS toks
      FROM documents WHERE doc_id < 200) d
LEFT JOIN LATERAL (SELECT unnest(d.toks) AS tok) t ON TRUE
""",
)
def proj_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode: docs whose filtered token array is
    empty survive as a single NULL-token row (explode would silently
    drop them — the classic lost-rows bug in pipelines that explode
    then re-aggregate)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 7)
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))
