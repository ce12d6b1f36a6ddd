"""Remaining TPC-H query shapes (Q1, Q7-Q9, Q11-Q13, Q15-Q17,
Q19-Q22) adapted to the fixture's reduced star schema.

The fixtures carry no ``partsupp`` table and no commit/receipt dates,
phone numbers, containers, or comments, so the queries that lean on
those columns keep their PLAN SHAPE (correlated aggregate, scalar
subquery, EXISTS / NOT EXISTS chain, disjunctive pushdown) while the
predicate moves to a column the fixture has — each docstring states
the substitution.  Together with wl_q2-q6/q10/q14/q18 in workload.py
this completes the 22-query TPC-H surface.

Scale notes are per-query; the common theme is that every correlated
subquery decorrelates to either a broadcast scalar (global aggregate)
or a re-keyed aggregate joined back on the correlation key — never a
per-row subquery, never a driver-side loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.detsum import dsum
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@query(
    "wl_q1_pricing_summary",
    group="workload",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def wl_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the pricing summary report — one scan, map-side
    partial aggregation into ~6 groups, no join.  The canonical
    measure of raw aggregate throughput: at 100 TB this is bounded by
    scan bandwidth because the combine runs at full parallelism and
    the final exchange carries six rows per partition."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts("1998-09-02")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "wl_q7_volume_shipping",
    group="workload",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def wl_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship
    year.  The nation pair disjunction is applied AFTER both nation
    dims broadcast onto the fact rows, so the big tables still join
    on pure equi-keys; the pair filter is a cheap post-broadcast
    predicate that AQE sees early enough to shrink the orders join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "wl_q8_market_share",
    group="workload",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    AND p.p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def wl_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by order year.  Every dim (part slice, supplier, both
    nation roles, region) broadcasts; only lineitem⋈orders and
    orders⋈customer shuffle.  The part filter lands first so the
    fact slice is cut to ~1/6 before any shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_regionkey").alias("cust_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(F.broadcast(r), F.col("cust_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "wl_q9_product_profit",
    group="workload",
    oracle="""
SELECT nation, o_year,
       round(CAST(sum(CAST(amount AS DECIMAL(18,6))) AS DOUBLE), 2)
           AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def wl_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp ⇒ unit cost proxied as
    10% of p_retailprice instead of ps_supplycost): profit on one
    product family by supplier nation and order year.  part/supplier/
    nation broadcast; the only shuffle joins lineitem to orders on
    the orderkey."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        # exact-decimal sum (queries/detsum.py): the double sum's
        # order-noise crossed the 2-dp boundary one decade above the
        # gate (round-8 sf0.1 sweep)
        .agg(dsum("amount", scale=2).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@query(
    "wl_q11_important_parts",
    group="workload",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice) AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(value, 2) AS part_value
FROM pv
WHERE value > (SELECT sum(value) * 0.0006 FROM pv)
ORDER BY part_value DESC, l_partkey ASC
""",
)
def wl_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp ⇒ part "value" = summed
    lineitem extendedprice): parts worth more than a fixed fraction
    of total inventory value.  The scalar subquery decorrelates to a
    1-row global aggregate cross-joined (broadcast) onto the per-part
    aggregate — the fact table is scanned ONCE: both the per-part and
    the global sums reuse the same shuffled aggregate, and the global
    side is a second tiny agg over the 2 000-row intermediate, not a
    rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("value"))
    total = pv.agg((F.sum("value") * 0.0006).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


@query(
    "wl_q12_ship_priority_class",
    group="workload",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def wl_q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commit/receipt dates ⇒
    "late" = shipped >90 days after order date, grouped by
    linestatus): high- vs low-priority order counts among late
    lines.  The lateness predicate references both sides so it
    evaluates post-join, but the join itself stays a pure orderkey
    equi-join and the shipdate year band pushes to the scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "wl_q13_cust_order_dist",
    group="workload",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def wl_q13_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (adapted: the comment NOT-LIKE filter becomes
    an orderpriority exclusion): distribution of order counts per
    customer, zero-order customers included via the left outer join.
    Two aggregation levels: the first shuffles on custkey, the second
    on the (tiny-domain) count — the classic histogram-of-histogram.
    count(o_orderkey) over the null-extended rows yields 0 for
    customers with no surviving orders, exactly like the SQL."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "wl_q15_top_supplier",
    group="workload",
    oracle="""
WITH revenue AS (
  -- exact DECIMAL sum: DuckDB re-evaluates an un-materialized CTE per
  -- reference with multi-threaded double summation, so a float max
  -- from one evaluation can equal NOTHING in the other (caught by the
  -- round-9 sf1 sweep: 0 oracle rows).  Decimal sums are
  -- order-independent, so every evaluation is bit-identical.
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def wl_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue for one
    quarter.  The view's max() scalar subquery becomes a 1-row
    aggregate over the per-supplier revenue frame, broadcast-joined
    back — the revenue intermediate is computed once and is
    |suppliers|-sized, so the "recompute the view twice" trap in
    naive translations never materializes.  The max-equality filter
    compares EXACT DECIMAL sums (detsum discipline): with doubles,
    any engine that re-evaluates the revenue relation (DuckDB
    re-runs un-materialized CTEs per reference, Spark re-plans under
    AQE/retry) can produce a max that equals nothing — caught at sf1
    by the round-9 decade sweep."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "wl_q16_supplier_cnt",
    group="workload",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def wl_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier relationships come from
    lineitem instead of partsupp; the complaints NOT-IN becomes a
    negative-acctbal exclusion): distinct supplier counts per
    (brand, type, size) outside one brand/type.  NOT IN on a
    non-null key ⇒ left-anti against the (tiny, broadcast) excluded
    supplier set; count(DISTINCT) shuffles once on the group key with
    partial distinct-aggregation map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "wl_q17_small_qty_revenue",
    group="workload",
    oracle="""
SELECT round(coalesce(sum(l.l_extendedprice), 0.0) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = p.p_partkey)
""",
)
def wl_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (adapted: container filter dropped — the
    fixture has no p_container, brand alone selects the part
    family): revenue from orders below 20% of a part's average
    quantity.  The correlated per-part average decorrelates into a
    pre-aggregated (partkey → threshold) frame joined on the
    correlation key; the threshold frame is |parts|-sized ⇒
    broadcast, so the fact table is scanned twice but never
    shuffled.  Quantities are integral and the threshold arithmetic
    is identical IEEE ops in both engines, so the strict < boundary
    is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@query(
    "wl_q19_disjunctive_revenue",
    group="workload",
    oracle="""
SELECT round(coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0.0), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def wl_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: container/shipmode terms dropped;
    each disjunct keeps brand + size band + quantity band): revenue
    under a three-way disjunctive predicate spanning both join
    sides.  Catalyst extracts the common join key and pushes the
    single-side residuals (brand∨brand∨brand, quantity hull) toward
    the scans; the join stays a broadcast equi-join with the full
    disjunction as a post-join filter — the classic test that an
    OR-of-ANDs doesn't degrade the join to nested-loop."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            # coalesce: a disjunction that matches nothing at some SF
            # must yield 0.0, not a NULL double (harness-hostile)
            F.round(
                F.coalesce(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue")
        )
    )


@query(
    "wl_q20_part_promotion",
    group="workload",
    oracle="""
WITH sp AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
), mx AS (
  SELECT l_partkey, max(qty) AS max_qty FROM sp GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM sp
JOIN mx ON sp.l_partkey = mx.l_partkey
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE sp.qty >= 0.8 * mx.max_qty
ORDER BY s.s_suppkey
""",
)
def wl_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp.availqty ⇒ a supplier
    "dominates" a part when its shipped quantity reaches 80% of the
    part's per-supplier maximum): suppliers dominating supply of any
    'red' part in 1997.  The nested aggregate chain (per supplier ×
    part → per part max → threshold join) mirrors the original's
    correlated half-sum; both intermediates are dimension-sized and
    the quantity sums are integral, so the >= boundary is exact."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    mx = sp.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.max("qty").alias("max_qty")
    )
    return (
        sp.join(F.broadcast(mx), sp.l_partkey == F.col("m_partkey"))
        .filter(F.col("qty") >= 0.8 * F.col("max_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "wl_q21_waiting_supplier",
    group="workload",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
)
def wl_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped >60 days after
    order date instead of receipt-vs-commit): suppliers who were the
    SOLE late supplier on a multi-supplier finalized order.  The
    EXISTS/NOT-EXISTS pair decorrelates into per-order supplier
    statistics — distinct suppliers overall and distinct LATE
    suppliers — computed as two aggregates keyed on the orderkey and
    joined back, instead of two correlated self-join probes per row.
    A late line qualifies iff its order has ≥2 suppliers total and
    exactly 1 distinct late supplier (necessarily this one).  All
    joins are orderkey equi-joins; no per-row subquery survives."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    n_supp = li.groupBy(F.col("l_orderkey").alias("ns_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_suppliers")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("nl_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_late_suppliers")
    )
    return (
        late.join(n_supp, F.col("l_orderkey") == F.col("ns_orderkey"))
        .join(n_late, F.col("l_orderkey") == F.col("nl_orderkey"))
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@query(
    "wl_q22_dormant_customers",
    group="workload",
    oracle="""
WITH pool AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
), thresh AS (
  SELECT avg(c_acctbal) AS avg_bal FROM pool WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM pool, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def wl_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: phone country codes ⇒ nation keys):
    well-funded customers in selected nations with no RECENT order
    (the fixture's order density leaves almost no customer with zero
    lifetime orders, so "dormant" = nothing since 1999).
    Three decorrelations in one query: the IN-list is a pushed scan
    filter, the average-balance scalar subquery is a 1-row broadcast
    cross join, and NOT EXISTS(orders) is a left-anti join on the
    custkey.  The anti join is the only shuffle over a big table —
    at 100 TB the orders side projects to just o_custkey before
    shuffling (column pruning), so the exchange carries one bigint
    per order."""
    pool = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    thresh = pool.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        pool.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
