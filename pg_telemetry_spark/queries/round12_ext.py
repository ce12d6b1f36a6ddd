"""Round-12 extensions (SURVEY §2.27) — trend/run diagnostics, lead-lag
correlation, tokenizer fertility, and link prediction.

Seven operators a telemetry board + training-data pipeline still ask
for after rounds 1-11:

- ``ts_spc_rules``     — Western-Electric-style control-chart RUNS
  rules (the runs tests ``ts_zscore_anomaly``'s single-point rule
  cannot see: shifts and drifts that never cross 3-sigma);
- ``ts_cross_corr``    — lagged cross-correlation between two event
  streams (the lead-lag probe: "do clicks predict purchases N hours
  out?");
- ``ts_mk_trend``      — Mann-Kendall trend test with tie-corrected
  variance (the non-parametric complement to ``ts_theilsen``'s slope:
  IS there a monotone trend, with a significance level);
- ``llm_fertility``    — tokenizer fertility by language (tokens per
  word / chars per token — the first number a tokenizer eval
  reports, Rust&al. 2021 "How Good is Your Tokenizer?");
- ``wl_link_prediction`` — common-neighbors / Jaccard / Adamic-Adar
  link scores for NON-adjacent item pairs on the co-purchase graph
  (Liben-Nowell & Kleinberg 2003) — the "customers who bought these
  together would likely buy THESE together" precompute, distinct
  from ``wl_recommend_item_cf`` which scores existing co-occurrence;
- ``fn_struct``        — the third leg of the complex-type triad
  (array/map/STRUCT): construction, lexicographic struct min/max as
  a one-aggregate composite arg-min, field extraction;
- ``ts_rolling_median`` — exact windowed median/p90 over a constant
  24-hour frame (the robust smoothing baseline an EWMA is not).

Scale shapes, stated up front:

- The three ts_ ops run on the HOURLY per-type series (720 ticks x
  |event_type| rows at every sf — tick-granular, never raw events):
  one groupBy compresses the fact table, then windows/self-joins act
  on a calendar-bounded frame.  ``ts_mk_trend``'s pairwise join is
  O(720^2) per type — time-bounded like ``ts_theilsen``, independent
  of event volume.
- All hourly series are integer COUNTS, so every sign()/side
  comparison the runs rules and the Mann-Kendall S statistic depend
  on is exact integer arithmetic in both engines; floats appear only
  in final scores, rounded to 6 like the rest of the suite.
- ``wl_link_prediction``'s wedge volume is sum(deg^2) over the
  one-order-month graph — the same bound the triangle counter
  (graph_ops.py) carries; candidate ranking is by the exact integer
  common-neighbor count, so the top-20 cutoff never rests on a
  float sum.
- ``llm_fertility`` is one hash aggregate over integer token counts;
  ratios divide exact integer sums (deterministic IEEE division).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.graph_ops import (
    _MONTH_HI,
    _MONTH_LO,
    _month_items,
    copurchase_edges,
)
from pg_telemetry_spark.cache import pin
from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

# The fixture calendar is a fixed month at every sf (TESTDATA.md);
# the dense axis is the same 720-hour spine ts_gapfill uses.
_CAL_LO = "2024-01-01 00:00:00"
_CAL_HI = "2024-01-30 23:00:00"

# Dense hourly per-type counts, shared by the three ts_ ops.  Missing
# hours count 0 — the runs rules need true adjacency, not just the
# observed ticks.
_HOURLY_SQL = f"""
  SELECT ax.bucket, ax.event_type, coalesce(c.cnt, 0) AS cnt
  FROM (
    SELECT t.bucket, ty.event_type
    FROM generate_series(TIMESTAMP '{_CAL_LO}', TIMESTAMP '{_CAL_HI}',
                         INTERVAL '1 hour') AS t(bucket)
    CROSS JOIN (SELECT DISTINCT event_type FROM {EVENTS_V} tv) ty
  ) ax
  LEFT JOIN (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
           count(*) AS cnt
    FROM {EVENTS_V} e GROUP BY 1, 2
  ) c ON ax.bucket = c.bucket AND ax.event_type = c.event_type
"""


def _hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (bucket, event_type, cnt) hourly spine — integer counts.

    The axis is generated distributed-side from the fixed fixture
    calendar (720 rows x |types| — constant, not data-sized); actual
    counts attach by one left join riding the groupBy's partitioning.
    """
    e = load_table(spark, sf_dir, "events")
    axis = (
        e.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(_CAL_LO).cast("timestamp_ntz"),
                    F.lit(_CAL_HI).cast("timestamp_ntz"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("bucket")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    actual = e.groupBy(
        F.window("ts", "1 hour").start.cast("timestamp_ntz").alias("bucket"),
        "event_type",
    ).agg(F.count("*").alias("cnt"))
    return axis.join(actual, ["bucket", "event_type"], "left").select(
        "bucket",
        "event_type",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
    )


@query(
    "ts_spc_rules",
    group="timeseries",
    oracle=f"""
WITH hourly AS ({_HOURLY_SQL}),
stats AS (
  SELECT bucket, event_type, cnt,
         avg(cnt) OVER (PARTITION BY event_type) AS mu,
         stddev_samp(cnt) OVER (PARTITION BY event_type) AS sigma
  FROM hourly
),
sided AS (
  SELECT *,
         CASE WHEN cnt > mu THEN 1 WHEN cnt < mu THEN -1 ELSE 0 END AS side,
         CASE WHEN cnt > lag(cnt) OVER w THEN 1
              WHEN cnt < lag(cnt) OVER w THEN -1
              WHEN lag(cnt) OVER w IS NULL THEN NULL ELSE 0 END AS dsign
  FROM stats
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
flagged AS (
  SELECT bucket, event_type, cnt,
         CASE WHEN sigma > 0 THEN round((cnt - mu) / sigma, 6) END AS z,
         (sigma > 0 AND abs((cnt - mu) / sigma) > 3) AS rule1,
         (count(*) OVER w9 = 9 AND min(side) OVER w9 = max(side) OVER w9
          AND min(side) OVER w9 <> 0) AS rule2,
         (count(dsign) OVER w5 = 5 AND min(dsign) OVER w5 = max(dsign) OVER w5
          AND min(dsign) OVER w5 <> 0) AS rule3
  FROM sided
  WINDOW w9 AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         w5 AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT bucket, event_type, cnt, z, rule1, rule2, rule3
FROM flagged WHERE rule1 OR rule2 OR rule3
ORDER BY event_type, bucket
""",
)
def ts_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-chart runs rules on the hourly per-type count series
    (Western Electric / Nelson): rule 1 — a point beyond 3 sigma;
    rule 2 — nine consecutive points strictly on one side of the
    center line (a sustained SHIFT no single point betrays); rule 3 —
    six consecutive monotonically rising or falling points (a DRIFT).

    The series is integer counts, so the side/direction signs the
    runs rules compare are exact in both engines; mu attaches as a
    whole-partition window over the 720-tick frame (constant-bounded
    — the partition IS the chart).  One groupBy compresses events to
    ticks, then three windows ride the same (event_type, bucket)
    sort — a single shuffle end-to-end at any scale."""
    hourly = _hourly_counts(spark, sf_dir)
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("bucket")
    w9 = wo.rowsBetween(-8, 0)
    w5 = wo.rowsBetween(-4, 0)
    stats = hourly.select(
        "bucket",
        "event_type",
        "cnt",
        F.avg("cnt").over(wp).alias("mu"),
        F.stddev_samp("cnt").over(wp).alias("sigma"),
    )
    lagc = F.lag("cnt").over(wo)
    sided = stats.select(
        "*",
        F.when(F.col("cnt") > F.col("mu"), 1)
        .when(F.col("cnt") < F.col("mu"), -1)
        .otherwise(0)
        .alias("side"),
        F.when(F.col("cnt") > lagc, 1)
        .when(F.col("cnt") < lagc, -1)
        .when(lagc.isNull(), F.lit(None))
        .otherwise(0)
        .alias("dsign"),
    )
    z_raw = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    flagged = sided.select(
        "bucket",
        "event_type",
        "cnt",
        F.when(F.col("sigma") > 0, F.round(z_raw, 6)).alias("z"),
        ((F.col("sigma") > 0) & (F.abs(z_raw) > 3)).alias("rule1"),
        (
            (F.count("*").over(w9) == 9)
            & (F.min("side").over(w9) == F.max("side").over(w9))
            & (F.min("side").over(w9) != 0)
        ).alias("rule2"),
        (
            (F.count("dsign").over(w5) == 5)
            & (F.min("dsign").over(w5) == F.max("dsign").over(w5))
            & (F.min("dsign").over(w5) != 0)
        ).alias("rule3"),
    )
    return flagged.filter(
        F.col("rule1") | F.col("rule2") | F.col("rule3")
    ).orderBy("event_type", "bucket")


@query(
    "ts_cross_corr",
    group="timeseries",
    oracle=f"""
WITH hourly AS ({_HOURLY_SQL}),
cx AS (SELECT bucket, cnt AS x FROM hourly WHERE event_type = 'click'),
cy AS (SELECT bucket, cnt AS y FROM hourly WHERE event_type = 'purchase')
SELECT l.lag_h,
       count(*) AS n_pairs,
       round(corr(cx.x, cy.y), 6) AS xcorr
FROM generate_series(0, 6) AS l(lag_h)
JOIN cx ON TRUE
JOIN cy ON cy.bucket = cx.bucket + l.lag_h * INTERVAL '1 hour'
GROUP BY l.lag_h
ORDER BY l.lag_h
""",
)
def ts_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly click and purchase
    count series: Pearson corr of (click[t], purchase[t+L]) for lags
    0..6 hours — the lead-lag probe that answers "how far ahead does
    traffic predict conversions?".

    Both series are the tick-granular spine (720 integer points each
    at any sf); the lag alignment is an equi-join on the shifted hour
    key — never a cross product over events — and each lag's corr is
    one pass over <=720 aligned pairs.  The hourly frame persists so
    the fact table is scanned once, not once per series branch."""
    hourly = pin(_hourly_counts(spark, sf_dir))
    cx = hourly.filter(F.col("event_type") == "click").select(
        "bucket", F.col("cnt").alias("x")
    )
    cy = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("bucket").alias("ybucket"), F.col("cnt").alias("y")
    )
    lags = cx.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("lag_h")
    )
    shifted = cx.crossJoin(lags).select(
        "lag_h",
        "x",
        F.expr("timestampadd(HOUR, lag_h, bucket)").alias("jbucket"),
    )
    return (
        shifted.join(cy, shifted["jbucket"] == cy["ybucket"])
        .groupBy("lag_h")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.corr("x", "y"), 6).alias("xcorr"),
        )
        .orderBy("lag_h")
    )


@query(
    "ts_mk_trend",
    group="timeseries",
    oracle=f"""
WITH hourly AS ({_HOURLY_SQL}),
s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.bucket < b.bucket
  GROUP BY a.event_type
),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(sum(t) AS BIGINT) AS n
  FROM (SELECT event_type, cnt, count(*) AS t FROM hourly GROUP BY 1, 2)
  GROUP BY event_type
)
SELECT s.event_type, ties.n, s.s_stat,
       round((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0, 6) AS var_s,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1)
                  WHEN s_stat < 0 THEN (s_stat + 1)
                  ELSE 0 END
             / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0), 6) AS z,
       CASE WHEN abs(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                                WHEN s_stat < 0 THEN s_stat + 1
                                ELSE 0 END AS DOUBLE)
                 / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)) > 1.96
            THEN CASE WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END
            ELSE 'no trend' END AS trend
FROM s JOIN ties USING (event_type)
ORDER BY event_type
""",
)
def ts_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type: S = sum of
    sign(c_j - c_i) over all hour pairs i<j, tie-corrected variance
    Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18, and the
    continuity-corrected normal score — the non-parametric "is this
    series trending, and is it significant?" companion to
    ``ts_theilsen``'s slope estimate.

    S is exact integer arithmetic on integer counts in both engines
    (no float sign flips); the pairwise join is O(720^2) per type —
    bounded by the CALENDAR, not the data, exactly like the Theil-Sen
    pair join — and the tie histogram is a constant-size groupBy.
    The hourly frame persists so the fact table is scanned ONCE (the
    pair join reads it twice, the tie histogram a third time)."""
    hourly = pin(_hourly_counts(spark, sf_dir))
    a = hourly.select(
        "event_type", F.col("bucket").alias("ab"), F.col("cnt").alias("ac")
    )
    b = hourly.select(
        F.col("event_type").alias("bt"),
        F.col("bucket").alias("bb"),
        F.col("cnt").alias("bc"),
    )
    s = (
        a.join(b, (a["event_type"] == b["bt"]) & (a["ab"] < b["bb"]))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("bc") > F.col("ac"), 1)
                .when(F.col("bc") < F.col("ac"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        hourly.groupBy("event_type", "cnt")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term"),
            F.sum("t").cast("bigint").alias("n"),
        )
    )
    j = s.join(ties, "event_type")
    n, tt, ss = F.col("n"), F.col("tie_term"), F.col("s_stat")
    var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    s_cc = (
        F.when(ss > 0, ss - 1).when(ss < 0, ss + 1).otherwise(0)
    )
    z_raw = s_cc / F.sqrt(var_s)
    return j.select(
        "event_type",
        "n",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z_raw, 6).alias("z"),
        F.when(
            F.abs(s_cc.cast("double") / F.sqrt(var_s)) > 1.96,
            F.when(ss > 0, "increasing").otherwise("decreasing"),
        )
        .otherwise("no trend")
        .alias("trend"),
    ).orderBy("event_type")


@query(
    "llm_fertility",
    group="llm_ext",
    oracle="""
WITH per_doc AS (
  SELECT lang,
         len(string_split(text, ' ')) AS ws,
         len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re,
         length(text) AS ch
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(re) AS BIGINT) AS re_tokens,
       round(CAST(sum(re) AS DOUBLE) / sum(ws), 6) AS fertility,
       round(CAST(sum(ch) AS DOUBLE) / sum(re), 6) AS chars_per_token,
       round(CAST(sum(re) AS DOUBLE) / count(*), 6) AS tokens_per_doc
FROM per_doc
GROUP BY lang
ORDER BY lang
""",
)
def llm_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: corpus-level tokens-per-word
    (how many subword tokens the BPE-ish regex tokenizer spends per
    whitespace word) and chars-per-token — the first chart a
    tokenizer evaluation reports, and the number that decides a
    language's effective context budget.  Uses the same regex
    tokenizer as ``llm_token_count`` so the two ops reconcile.

    Ratios divide exact integer SUMS (corpus-level fertility, not an
    average of per-doc floats) — deterministic division in both
    engines.  One narrow projection + one hash aggregate; |lang|
    groups, map-side combinable at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("ws"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("re"),
        F.length("text").alias("ch"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").cast("bigint").alias("ws_tokens"),
            F.sum("re").cast("bigint").alias("re_tokens"),
            F.round(
                F.sum("re").cast("double") / F.sum("ws"), 6
            ).alias("fertility"),
            F.round(
                F.sum("ch").cast("double") / F.sum("re"), 6
            ).alias("chars_per_token"),
            F.round(
                F.sum("re").cast("double") / F.count("*"), 6
            ).alias("tokens_per_doc"),
        )
        .orderBy("lang")
    )


@query(
    "wl_link_prediction",
    group="graph",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '{_MONTH_LO}'
    AND o.o_orderdate <  TIMESTAMP '{_MONTH_HI}'
), e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), sym AS (
  SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
), deg AS (
  SELECT src AS node, count(*) AS d FROM sym GROUP BY src
), wedge AS (
  SELECT s1.src AS x, s2.dst AS z, s1.dst AS m
  FROM sym s1 JOIN sym s2 ON s1.dst = s2.src AND s1.src < s2.dst
), cand AS (
  SELECT w.x, w.z,
         count(*) AS cn,
         round(sum(1.0 / ln(dm.d)), 6) AS adamic_adar
  FROM wedge w JOIN deg dm ON w.m = dm.node
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.x AND e.v = w.z)
  GROUP BY w.x, w.z
)
SELECT c.x, c.z, c.cn,
       round(CAST(c.cn AS DOUBLE) / (dx.d + dz.d - c.cn), 6) AS jaccard,
       c.adamic_adar
FROM cand c JOIN deg dx ON c.x = dx.node JOIN deg dz ON c.z = dz.node
ORDER BY c.cn DESC, c.x, c.z
LIMIT 20
""",
)
def wl_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the one-order-month co-purchase graph
    (Liben-Nowell & Kleinberg 2003): for item pairs that are NOT yet
    adjacent, score the likelihood of a future edge by common
    neighbors, Jaccard overlap of neighborhoods, and Adamic-Adar
    (rare shared neighbors weigh more: sum 1/ln(deg(m))); report the
    top-20 candidates.  Complements ``wl_recommend_item_cf``, which
    ranks pairs that already co-occur.

    Scale shape: wedges are ONE equi-join of the symmetric edge list
    on the middle vertex — volume sum(deg^2) over the month-windowed
    graph, the identical bound the triangle counter carries — then
    one hash aggregate on the (x, z) candidate key and a LEFT ANTI
    join against the edge list drops known links.  Ranking uses the
    exact integer common-neighbor count (floats are reported, never
    ordered by), so the top-20 cutoff is engine-stable.  Every
    common neighbor has degree >= 2 by construction, so ln(d) > 0."""
    e = pin(copurchase_edges(_month_items(spark, sf_dir)))
    sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    s1 = sym.select(F.col("src").alias("x"), F.col("dst").alias("m"))
    s2 = sym.select(F.col("src").alias("m2"), F.col("dst").alias("z"))
    wedge = s1.join(s2, (s1["m"] == s2["m2"]) & (s1["x"] < s2["z"])).select(
        "x", "z", "m"
    )
    cand = (
        wedge.join(F.broadcast(deg.withColumnRenamed("node", "m")), "m")
        .join(
            e.withColumnRenamed("u", "x").withColumnRenamed("v", "z"),
            ["x", "z"],
            "left_anti",
        )
        .groupBy("x", "z")
        .agg(
            F.count("*").alias("cn"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("adamic_adar"),
        )
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dxd"))
    dz = deg.select(F.col("node").alias("z"), F.col("d").alias("dzd"))
    return (
        cand.join(F.broadcast(dx), "x")
        .join(F.broadcast(dz), "z")
        .select(
            "x",
            "z",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("dxd") + F.col("dzd") - F.col("cn")),
                6,
            ).alias("jaccard"),
            "adamic_adar",
        )
        .orderBy(F.col("cn").desc(), "x", "z")
        .limit(20)
    )


@query(
    "fn_struct",
    group="scalars",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_first,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_shipdate DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn_last
  FROM lineitem
)
SELECT f.l_returnflag,
       f.l_shipdate AS first_ship_date, f.l_orderkey AS first_ship_order,
       f.l_linenumber AS first_ship_line,
       l.l_shipdate AS last_ship_date, l.l_orderkey AS last_ship_order,
       l.l_linenumber AS last_ship_line,
       n.n_lines
FROM ranked f
JOIN ranked l ON f.l_returnflag = l.l_returnflag AND l.rn_last = 1
JOIN (SELECT l_returnflag, count(*) AS n_lines FROM lineitem GROUP BY 1) n
  ON f.l_returnflag = n.l_returnflag
WHERE f.rn_first = 1
ORDER BY f.l_returnflag
""",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct type surface — the third leg of the complex-type triad
    (`fn_array`, `fn_map` exist): struct construction, LEXICOGRAPHIC
    struct ordering (min/max of a struct compares fields left to
    right — the idiomatic Spark way to take an arg-min over a
    composite ordering in ONE aggregate, no window, no self-join),
    and field extraction from the winning struct.  Per return flag:
    the identity of the first and last shipment under the total
    (shipdate, orderkey, linenumber) order.

    The oracle expresses the same semantics with two row_number
    windows — engine-idiomatic formulations on each side.  Scale:
    one map-side-combinable aggregate over the fact table (struct
    min/max is not hash-agg-buffer-compatible, so Spark plans a
    SortAggregate — partial per-partition, sorted on the 3-value
    grouping key, still O(1) state per group), where the window
    formulation would globally sort each flag's rows twice."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.struct("l_shipdate", "l_orderkey", "l_linenumber")
    agg = li.groupBy("l_returnflag").agg(
        F.min(key).alias("first_s"),
        F.max(key).alias("last_s"),
        F.count("*").alias("n_lines"),
    )
    return agg.select(
        "l_returnflag",
        F.col("first_s.l_shipdate").alias("first_ship_date"),
        F.col("first_s.l_orderkey").alias("first_ship_order"),
        F.col("first_s.l_linenumber").alias("first_ship_line"),
        F.col("last_s.l_shipdate").alias("last_ship_date"),
        F.col("last_s.l_orderkey").alias("last_ship_order"),
        F.col("last_s.l_linenumber").alias("last_ship_line"),
        "n_lines",
    ).orderBy("l_returnflag")


@query(
    "ts_rolling_median",
    group="timeseries",
    oracle=f"""
WITH hourly AS ({_HOURLY_SQL}),
roll AS (
  SELECT bucket, event_type, cnt,
         count(*) OVER w AS n_win,
         quantile_cont(cnt, 0.5) OVER w AS med,
         quantile_cont(cnt, 0.9) OVER w AS p90
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT bucket, event_type, cnt,
       round(med, 6) AS med_24h,
       round(p90, 6) AS p90_24h,
       (cnt > 2 * med) AS spike
FROM roll WHERE n_win = 24
ORDER BY event_type, bucket
""",
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median + p90 over the trailing 24 h of the hourly
    per-type count series — the robust baseline a telemetry board
    smooths against (the median shrugs off the spikes an EWMA chases),
    plus a spike flag against twice the rolling median.

    Exact windowed percentiles with linear interpolation — verified
    bit-identical between Spark's `percentile` and DuckDB's
    `quantile_cont` — over a CONSTANT 24-row frame, so per-row state
    is O(frame), not O(history).  The spike comparison is integer cnt
    vs 2x a median of integers (always k or k+0.5, exactly
    representable), so the flag can never sit on a float knife-edge.
    Same single (type, bucket)-sorted shuffle as every series window;
    only full frames emit (the first 23 h per type are warm-up)."""
    hourly = _hourly_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-23, 0)
    )
    roll = hourly.select(
        "bucket",
        "event_type",
        "cnt",
        F.count("*").over(w).alias("n_win"),
        F.percentile(F.col("cnt"), F.lit(0.5)).over(w).alias("med"),
        F.percentile(F.col("cnt"), F.lit(0.9)).over(w).alias("p90"),
    )
    return (
        roll.filter(F.col("n_win") == 24)
        .select(
            "bucket",
            "event_type",
            "cnt",
            F.round("med", 6).alias("med_24h"),
            F.round("p90", 6).alias("p90_24h"),
            (F.col("cnt") > 2 * F.col("med")).alias("spike"),
        )
        .orderBy("event_type", "bucket")
    )
