"""EP2 — the SQL string entry point (SURVEY.md §3).

Every §2 operator is primarily expressed through the DataFrame API
(EP1); these queries exercise the second front door: temp views +
``spark.sql`` with ANTLR parsing, join hints, CTEs, windows, interval
arithmetic, and lateral column references — proving both surfaces
drive the same Catalyst pipeline (same oracle discipline applies
unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")


@query(
    "sql_star_join_hinted",
    group="sql",
    oracle="""
SELECT r.r_name, o.o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus <> 'P'
GROUP BY r.r_name, o.o_orderpriority
""",
)
def sql_star_join_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL star join with explicit BROADCAST hints — the SQL spelling
    of join_broadcast's plan."""
    _register(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
               r.r_name, o.o_orderpriority,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6)))
                          AS DOUBLE), 6) AS revenue
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n   ON c.c_nationkey = n.n_nationkey
        JOIN v_region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus <> 'P'
        GROUP BY r.r_name, o.o_orderpriority
        """
    )


@query(
    "sql_cte_window",
    group="sql",
    oracle="""
WITH totals AS (
  SELECT o_custkey, sum(o_totalprice) AS total
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment, t.o_custkey AS custkey, round(t.total, 6) AS total,
       rnk
FROM (
  SELECT o_custkey, total,
         row_number() OVER (ORDER BY total DESC, o_custkey ASC) AS rnk
  FROM totals
) t JOIN customer c ON c.c_custkey = t.o_custkey
WHERE rnk <= 25
""",
)
def sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window + rank-filter through the SQL front (Spark lacks
    QUALIFY; the subquery filter is the portable spelling)."""
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH totals AS (
          SELECT o_custkey, sum(o_totalprice) AS total
          FROM v_orders GROUP BY o_custkey
        )
        SELECT c.c_mktsegment, t.o_custkey AS custkey, round(t.total, 6) AS total,
               rnk
        FROM (
          SELECT o_custkey, total,
                 row_number() OVER (ORDER BY total DESC, o_custkey ASC) AS rnk
          FROM totals
        ) t JOIN v_customer c ON c.c_custkey = t.o_custkey
        WHERE rnk <= 25
        """
    )


@query(
    "sql_interval_arith",
    group="sql",
    oracle="""
SELECT event_id,
       CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS deadline,
       CAST(CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY AS DATE) AS prev_day,
       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
         + INTERVAL 6 HOUR AS six_am
FROM events
WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03'
""",
)
def sql_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic through SQL (DayTimeInterval semantics)."""
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id,
               ts + INTERVAL 90 MINUTE AS deadline,
               CAST(ts - INTERVAL 1 DAY AS DATE) AS prev_day,
               CAST(date_trunc('day', ts) AS timestamp_ntz) + INTERVAL 6 HOUR AS six_am
        FROM v_events
        WHERE ts < TIMESTAMP '2024-01-03'
        """
    )
