"""Telemetry enrichment & matching extensions (round 9, batch 5).

The enrichment layer every telemetry warehouse runs before analysis:
IPv4/CIDR subnet aggregation, user-agent parsing, exact
nearest-neighbor geo join via grid bucketing, entity resolution with
deletion-neighborhood blocking, sweep-line interval concurrency, and
two-window schema-profile drift.

Each operator synthesizes its enrichment columns deterministically
from existing table columns (the fixtures carry no IP/UA/geo fields)
with IDENTICAL integer-residue arithmetic on both engines, so the
oracle comparison exercises the full parse/match/aggregate pipeline.

Scale notes (100 TB):
- ``fn_ip_cidr`` / ``fn_useragent`` are pure narrow maps into one
  hash aggregate — map-side combine, no UDF, no extra shuffle.
- ``join_geo_grid`` is the textbook replacement for a KNN cross
  join: bucket both sides into g-degree grid cells, explode the POI
  (small) side to its 3x3 neighborhood, equi-join on cell, take the
  per-point min.  A candidate at distance <= g is provably the
  global argmin (any POI outside the ring is > g away on one axis),
  so only the residual points (no candidate, or best > g) fall back
  to a broadcast scan of the POI dimension — bounded, documented
  BNLJ over a dimension-sized build side.
- ``wl_entity_match`` blocks fuzzy candidates with radius-1 deletion
  neighborhoods (self + each single-char deletion): two strings at
  Levenshtein distance <= 1 ALWAYS share a key, so the equi-join on
  keys is a lossless prefilter and pair work is bounded by key
  collisions, never |dirty| x |registry|.
- ``ts_concurrency`` is the sweep-line rewrite of interval overlap
  counting: unpivot to +1/-1 boundary events and running-sum inside
  each event_type partition — O(n log n) per key vs the O(n^2)
  interval self-join.
- ``dq_schema_drift`` compares per-column profiles of two time
  windows with single-pass aggregates per side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.detsum import DAVG_SQL, davg
from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


# ------------------------------------------------------------- IPv4 / CIDR


@query(
    "fn_ip_cidr",
    group="scalars",
    oracle="""
WITH ips AS (
  SELECT event_id, user_id,
         10 AS o1,
         CAST((event_id * 7) % 256 AS BIGINT) AS o2,
         CAST((event_id * 13) % 256 AS BIGINT) AS o3,
         CAST(event_id % 256 AS BIGINT) AS o4
  FROM events
), enr AS (
  SELECT event_id, user_id,
         concat(CAST(o1 AS VARCHAR), '.', CAST(o2 AS VARCHAR), '.',
                CAST(o3 AS VARCHAR), '.', CAST(o4 AS VARCHAR)) AS ip,
         o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_int,
         o2 AS b16
  FROM ips
)
SELECT concat('10.', CAST(b16 AS VARCHAR), '.0.0/16') AS subnet,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CASE WHEN ip_int BETWEEN 10*16777216 + 42*65536
                                     AND 10*16777216 + 42*65536 + 65535
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_blocklist,
       min(ip) AS min_ip
FROM enr
GROUP BY b16
ORDER BY n_events DESC, subnet ASC
LIMIT 20
""",
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 enrichment + CIDR rollup: synthesize a deterministic
    IPv4 per event (octets from event_id residues), convert to a
    32-bit integer, aggregate events/distinct-users per /16 subnet,
    and count hits against a literal blocklist CIDR (10.42.0.0/16)
    via integer range containment — the standard way to make CIDR
    membership sargable (a BETWEEN on the int form, not a string
    prefix match).

    Scale shape: narrow map -> one hash agg on the /16 key (256
    groups) -> top-20; the int-range blocklist test is a per-row
    constant-fold, and a real blocklist table would broadcast."""
    ev = load_table(spark, sf_dir, "events")
    o2 = (F.col("event_id") * 7 % 256).cast("long")
    o3 = (F.col("event_id") * 13 % 256).cast("long")
    o4 = (F.col("event_id") % 256).cast("long")
    enr = ev.select(
        "event_id",
        "user_id",
        F.concat_ws(
            ".", F.lit("10"), o2.cast("string"), o3.cast("string"), o4.cast("string")
        ).alias("ip"),
        (F.lit(10 * 16777216) + o2 * 65536 + o3 * 256 + o4).alias("ip_int"),
        o2.alias("b16"),
    )
    lo = 10 * 16777216 + 42 * 65536
    return (
        enr.groupBy("b16")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.col("ip_int").between(lo, lo + 65535).cast("bigint")
            ).alias("n_in_blocklist"),
            F.min("ip").alias("min_ip"),
        )
        .select(
            F.concat(
                F.lit("10."), F.col("b16").cast("string"), F.lit(".0.0/16")
            ).alias("subnet"),
            "n_events",
            "n_users",
            "n_in_blocklist",
            "min_ip",
        )
        .orderBy(F.col("n_events").desc(), F.col("subnet").asc())
        .limit(20)
    )


# --------------------------------------------------------------- user agent


_UA_BROWSERS = ["Chrome", "Firefox", "Safari", "Edge", "curl"]
_UA_OS = ["Windows NT 10.0", "Macintosh", "X11; Linux x86_64"]

_UA_SQL = """
  SELECT event_id, user_id,
         CASE WHEN event_id % 17 = 0
              THEN 'Mozilla/5.0 (compatible; Googlebot/2.1)'
              ELSE concat(
                'Mozilla/5.0 (',
                CASE CAST(event_id % 3 AS INT)
                  WHEN 0 THEN 'Windows NT 10.0'
                  WHEN 1 THEN 'Macintosh'
                  ELSE 'X11; Linux x86_64' END,
                ') ',
                CASE CAST(event_id % 5 AS INT)
                  WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
                  WHEN 2 THEN 'Safari' WHEN 3 THEN 'Edge'
                  ELSE 'curl' END,
                '/', CAST(90 + event_id % 40 AS VARCHAR),
                '.0.', CAST(event_id % 1000 AS VARCHAR))
         END AS ua
  FROM events
"""


@query(
    "fn_useragent",
    group="scalars",
    oracle=f"""
WITH uas AS ({_UA_SQL}), parsed AS (
  SELECT user_id,
         CASE WHEN ua LIKE '%Googlebot%' THEN 'bot'
              ELSE regexp_extract(ua, '\\) (Chrome|Firefox|Safari|Edge|curl)/', 1)
         END AS family,
         CASE WHEN ua LIKE '%Googlebot%' THEN -1
              ELSE CAST(regexp_extract(ua, '/(\\d+)\\.0\\.', 1) AS BIGINT)
         END AS major,
         regexp_extract(ua, '\\(([^)]*)\\)', 1) AS os
  FROM uas
)
SELECT family, major,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT os) AS n_os
FROM parsed
GROUP BY family, major
ORDER BY family ASC, major ASC
""",
)
def fn_useragent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent parse + family/version rollup: synthesize a
    deterministic UA string per event (browser family, major.minor
    version, OS token, a bot class every 17th event), parse it back
    with anchored ``regexp_extract`` (family, major version, OS
    parenthetical), and aggregate events/users/OS-spread per
    (family, major).

    Scale shape: two regex extracts + one LIKE per row — narrow,
    JVM-side, codegen'd — into a ~200-group hash agg.  The regexes
    are anchored on literal separators so the engine's regex NFA
    stays linear; no UDF, identical extract semantics both engines
    (empty string on no-match)."""
    ev = load_table(spark, sf_dir, "events")
    bot = F.col("event_id") % 17 == 0
    ua = F.when(
        bot, F.lit("Mozilla/5.0 (compatible; Googlebot/2.1)")
    ).otherwise(
        F.concat(
            F.lit("Mozilla/5.0 ("),
            F.element_at(
                F.array(*[F.lit(o) for o in _UA_OS]),
                (F.col("event_id") % 3).cast("int") + 1,
            ),
            F.lit(") "),
            F.element_at(
                F.array(*[F.lit(b) for b in _UA_BROWSERS]),
                (F.col("event_id") % 5).cast("int") + 1,
            ),
            F.lit("/"),
            (90 + F.col("event_id") % 40).cast("string"),
            F.lit(".0."),
            (F.col("event_id") % 1000).cast("string"),
        )
    )
    parsed = ev.select("user_id", ua.alias("ua")).select(
        "user_id",
        F.when(F.col("ua").contains("Googlebot"), F.lit("bot"))
        .otherwise(
            F.regexp_extract("ua", r"\) (Chrome|Firefox|Safari|Edge|curl)/", 1)
        )
        .alias("family"),
        F.when(F.col("ua").contains("Googlebot"), F.lit(-1).cast("bigint"))
        .otherwise(F.regexp_extract("ua", r"/(\d+)\.0\.", 1).cast("bigint"))
        .alias("major"),
        F.regexp_extract("ua", r"\(([^)]*)\)", 1).alias("os"),
    )
    return (
        parsed.groupBy("family", "major")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("os").alias("n_os"),
        )
        .orderBy(F.col("family").asc(), F.col("major").asc())
    )


# ------------------------------------------------------- geo grid NN join

#: grid cell width in degrees; candidates within one ring are exact
_GEO_CELL = 6.0

_GEO_PTS_SQL = """
  SELECT c_custkey AS pt_id,
         CAST((c_custkey * 997) % 6000 AS DOUBLE) / 100.0 - 30.0 AS lat,
         CAST((c_custkey * 1399) % 6000 AS DOUBLE) / 100.0 - 30.0 AS lon
  FROM customer WHERE c_custkey < 5000
"""
_GEO_POI_SQL = """
  SELECT s_suppkey AS poi_id,
         CAST((s_suppkey * 937) % 6000 AS DOUBLE) / 100.0 - 30.0 AS plat,
         CAST((s_suppkey * 1381) % 6000 AS DOUBLE) / 100.0 - 30.0 AS plon
  FROM supplier WHERE s_suppkey < 500
"""


@query(
    "join_geo_grid",
    group="joins",
    oracle=f"""
WITH pts AS ({_GEO_PTS_SQL}), poi AS ({_GEO_POI_SQL}), scored AS (
  SELECT pt_id, poi_id,
         round((lat-plat)*(lat-plat) + (lon-plon)*(lon-plon), 9) AS d2,
         row_number() OVER (
           PARTITION BY pt_id
           ORDER BY round((lat-plat)*(lat-plat) + (lon-plon)*(lon-plon), 9) ASC,
                    poi_id ASC) AS rn
  FROM pts CROSS JOIN poi
)
SELECT pt_id, poi_id AS nearest_poi, d2 AS dist2
FROM scored WHERE rn = 1
""",
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-POI join via grid bucketing (the scale-safe
    rewrite of a KNN cross join).  Points (from customer) and POIs
    (from supplier) get deterministic lat/lon in a 60x60-degree box;
    each POI is exploded into its 3x3 neighborhood of g-degree grid
    cells and equi-joined to points on the cell key; the per-point
    min over candidates is EXACT whenever best-candidate distance
    <= g (any POI outside the ring is > g away on at least one
    axis), so only residual points — none in the ring, or a best
    candidate farther than g — take the fallback broadcast scan of
    the POI dimension.  The oracle computes the same argmin by brute
    force, so a hash match proves the pruning is lossless.

    Distances are squared-euclidean in degrees (pure +/* — IEEE-
    identical on both engines, unlike trig) rounded to 9 dp before
    ranking, with poi_id as the total-order tie-break.

    Scale shape: the exploded-POI side is 9x a DIMENSION (broadcast);
    the probe side shuffles nothing (cell key is computed map-side,
    the join is broadcast-hash).  The fallback BNLJ is bounded by the
    residual count and the same broadcast build — at crawl scale with
    a dense POI set it is empty."""
    g = _GEO_CELL
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 5000)
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 500)
    pts = cust.select(
        F.col("c_custkey").alias("pt_id"),
        ((F.col("c_custkey") * 997 % 6000).cast("double") / 100.0 - 30.0).alias("lat"),
        ((F.col("c_custkey") * 1399 % 6000).cast("double") / 100.0 - 30.0).alias("lon"),
    )
    poi = supp.select(
        F.col("s_suppkey").alias("poi_id"),
        ((F.col("s_suppkey") * 937 % 6000).cast("double") / 100.0 - 30.0).alias("plat"),
        ((F.col("s_suppkey") * 1381 % 6000).cast("double") / 100.0 - 30.0).alias("plon"),
    )
    # explode each POI into its 3x3 cell neighborhood
    ring = F.expr("explode(sequence(-1, 1))")
    poi_cells = (
        poi.withColumn("cx0", F.floor(F.col("plat") / g))
        .withColumn("cy0", F.floor(F.col("plon") / g))
        .withColumn("dx", ring)
        .withColumn("dy", ring)
        .select(
            "poi_id",
            "plat",
            "plon",
            (F.col("cx0") + F.col("dx")).alias("cx"),
            (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    probed = pts.withColumn("cx", F.floor(F.col("lat") / g)).withColumn(
        "cy", F.floor(F.col("lon") / g)
    )
    d2 = F.round(
        (F.col("lat") - F.col("plat")) * (F.col("lat") - F.col("plat"))
        + (F.col("lon") - F.col("plon")) * (F.col("lon") - F.col("plon")),
        9,
    )
    w = Window.partitionBy("pt_id").orderBy(F.col("d2").asc(), F.col("poi_id").asc())
    ring_best = (
        probed.join(F.broadcast(poi_cells), ["cx", "cy"], "left")
        .select("pt_id", "lat", "lon", "poi_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    resolved = ring_best.filter(
        F.col("poi_id").isNotNull() & (F.col("d2") <= F.lit(g * g))
    ).select("pt_id", F.col("poi_id").alias("nearest_poi"), F.col("d2").alias("dist2"))
    # residual points: exact fallback over the broadcast POI dimension
    residual = ring_best.filter(
        F.col("poi_id").isNull() | (F.col("d2") > F.lit(g * g))
    ).select("pt_id", "lat", "lon")
    fb_best = (
        residual.join(F.broadcast(poi))
        .select("pt_id", "poi_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pt_id", F.col("poi_id").alias("nearest_poi"), F.col("d2").alias("dist2"))
    )
    return resolved.unionByName(fb_best)


# --------------------------------------------------- entity match (blocked)

#: dirty side: one planted edit per record, class by custkey % 3
#: (substitute a digit / delete a digit / insert a digit — all
#: Levenshtein distance 1 from the clean name)
_EM_DIRTY_SQL = """
  SELECT c_custkey AS dirty_id,
         CASE CAST(c_custkey % 3 AS INT)
           WHEN 0 THEN concat(substring(c_name, 1, 13),
                              CAST((CAST(substring(c_name, 14, 1) AS INT) + 1) % 10
                                   AS VARCHAR),
                              substring(c_name, 15))
           WHEN 1 THEN concat(substring(c_name, 1, 12), substring(c_name, 14))
           ELSE concat(substring(c_name, 1, 11), '7', substring(c_name, 12))
         END AS dirty_name
  FROM customer WHERE c_custkey < 2000
"""
_EM_CLEAN_SQL = "SELECT c_custkey, c_name FROM customer WHERE c_custkey < 5000"

#: SQL deletion-neighborhood (radius 1): the string itself plus each
#: single-character deletion
_EM_KEYS_SQL = (
    "unnest(list_prepend({s}, list_transform(generate_series(1, length({s})), "
    "i -> concat(substring({s}, 1, i-1), substring({s}, i+1)))))"
)


@query(
    "wl_entity_match",
    group="workload",
    oracle=f"""
WITH dirty AS ({_EM_DIRTY_SQL}), clean AS ({_EM_CLEAN_SQL}), scored AS (
  SELECT d.dirty_id, d.dirty_name, c.c_custkey,
         levenshtein(d.dirty_name, c.c_name) AS dist,
         row_number() OVER (
           PARTITION BY d.dirty_id
           ORDER BY levenshtein(d.dirty_name, c.c_name) ASC, c.c_custkey ASC) AS rn
  FROM dirty d CROSS JOIN clean c
  WHERE levenshtein(d.dirty_name, c.c_name) <= 1
)
SELECT dirty_id, dirty_name,
       c_custkey AS matched_id,
       dist
FROM scored WHERE rn = 1
ORDER BY dirty_id
""",
)
def wl_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with deletion-neighborhood blocking: a dirty
    CRM feed (one planted digit substitution / deletion / insertion
    per name) is matched back to the clean registry.  Both sides
    generate radius-1 deletion keys (the string itself + each
    single-char deletion); two strings at Levenshtein distance <= 1
    ALWAYS share at least one key (substitution: delete the edited
    position on both; deletion/insertion: the shorter string equals a
    deletion variant of the longer), so the equi-join on keys is a
    LOSSLESS prefilter.  Survivors are verified with exact
    ``levenshtein() <= 1`` and the best match picked per dirty row
    (min distance, then min custkey).  The oracle brute-forces the
    same rule over the cross product, so a hash match proves blocking
    recall = 1.

    Scale shape: key explosion is ~(len+1) rows per record; the join
    is a hash equi-join on the key with pair work bounded by key
    collisions — |dirty| x |registry| never materializes.  At 100 TB
    the same plan holds with the registry side bucketed on key."""
    cust = load_table(spark, sf_dir, "customer")
    clean = cust.filter(F.col("c_custkey") < 5000).select("c_custkey", "c_name")
    d = cust.filter(F.col("c_custkey") < 2000)
    nm = F.col("c_name")
    dirty_name = (
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring(nm, 1, 13),
                ((F.substring(nm, 14, 1).cast("int") + 1) % 10).cast("string"),
                F.expr("substring(c_name, 15)"),
            ),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(F.substring(nm, 1, 12), F.expr("substring(c_name, 14)")),
        )
        .otherwise(
            F.concat(F.substring(nm, 1, 11), F.lit("7"), F.expr("substring(c_name, 12)"))
        )
    )
    dirty = d.select(F.col("c_custkey").alias("dirty_id"), dirty_name.alias("dirty_name"))

    del_keys = (
        "explode(array_prepend(transform(sequence(1, length({s})), "
        "i -> concat(substring({s}, 1, i-1), substring({s}, i+1))), {s}))"
    )
    dkeys = dirty.select(
        "dirty_id", "dirty_name", F.expr(del_keys.format(s="dirty_name")).alias("k")
    )
    ckeys = clean.select(
        "c_custkey", "c_name", F.expr(del_keys.format(s="c_name")).alias("k")
    )
    cand = (
        dkeys.join(ckeys, "k")
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct()
    )
    verified = cand.select(
        "dirty_id",
        "dirty_name",
        "c_custkey",
        F.levenshtein("dirty_name", "c_name").alias("dist"),
    ).filter(F.col("dist") <= 1)
    w = Window.partitionBy("dirty_id").orderBy(
        F.col("dist").asc(), F.col("c_custkey").asc()
    )
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dirty_id", "dirty_name", F.col("c_custkey").alias("matched_id"), "dist"
        )
        .orderBy("dirty_id")
    )


# ------------------------------------------------------ sweep-line overlap


@query(
    "ts_concurrency",
    group="timeseries",
    oracle=f"""
WITH iv AS (
  SELECT event_id, event_type, ts AS t0,
         ts + to_seconds(CAST(60 + CAST(value * 60 AS BIGINT) AS BIGINT)) AS t1
  FROM {EVENTS_V}
), pts AS (
  SELECT event_type, t0 AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, t1 AS t, -1 AS delta, event_id FROM iv
), run AS (
  SELECT event_type, t,
         sum(delta) OVER (
           PARTITION BY event_type
           ORDER BY t ASC, delta ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM pts
), ranked AS (
  SELECT event_type, t, conc,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY conc DESC, t ASC) AS rn
  FROM run
)
SELECT event_type,
       CAST(conc AS BIGINT) AS peak_concurrency,
       t AS peak_at
FROM ranked WHERE rn = 1
ORDER BY event_type
""",
)
def ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per event type, by sweep line:
    each event opens an interval [ts, ts + 60 + 60*value seconds);
    unpivot to +1 (open) / -1 (close) boundary points, running-sum in
    boundary order (closes before opens at the same instant — the
    half-open interval convention, pinned by the delta ASC sort key,
    with event_id as the final total-order tie-break), then take the
    earliest instant of the per-type maximum.

    Scale shape: the sweep line turns interval-overlap counting —
    O(n^2) as a self-join — into a 2n-row union and a running sum.
    The running sum is TWO-LEVEL (the agg_weighted_median recipe):
    event_type alone has ~6 values, so a per-type window would
    serialize millions of boundary points through 6 task sorts no
    matter the core count.  Instead boundary points bucket by hour,
    a window over the tiny (type, hour) bucket table computes each
    bucket's carried open-count offset, and the within-bucket running
    sums then sort (type x hour) partitions fully in parallel —
    identical values, since hour buckets partition the sweep order."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        "event_type",
        F.col("ts").alias("t0"),
        F.expr(
            "timestampadd(SECOND, CAST(60 + CAST(value * 60 AS BIGINT) AS BIGINT), ts)"
        ).alias("t1"),
    )
    pts = (
        iv.select(
            "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta"), "event_id"
        )
        .unionByName(
            iv.select(
                "event_type",
                F.col("t1").alias("t"),
                F.lit(-1).alias("delta"),
                "event_id",
            )
        )
        .withColumn("bucket", F.date_trunc("hour", "t"))
    )
    # level 1: per-bucket net delta (map-side combinable) -> the
    # offset each bucket inherits from every earlier bucket; the
    # window runs over types x hours rows, not boundary points
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        pts.groupBy("event_type", "bucket")
        .agg(F.sum("delta").alias("tot"))
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("offset"),
        )
    )
    # level 2: within-bucket running sums, (type, hour)-partitioned —
    # parallel small sorts; offset + running sum == the global sweep
    w_run = (
        Window.partitionBy("event_type", "bucket")
        .orderBy(F.col("t").asc(), F.col("delta").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.join(F.broadcast(offsets), ["event_type", "bucket"]).select(
        "event_type",
        "bucket",
        "t",
        (F.col("offset") + F.sum("delta").over(w_run)).alias("conc"),
    )
    # per-bucket peak (same partitioning as w_run — no extra
    # exchange), then the global per-type argmax over the tiny
    # bucket-peak table; earliest-t tie-break survives both levels
    # because buckets partition time
    w_bpk = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("conc").desc(), F.col("t").asc()
    )
    bucket_peaks = (
        run.withColumn("rn", F.row_number().over(w_bpk))
        .filter(F.col("rn") == 1)
        .select("event_type", "t", "conc")
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("conc").desc(), F.col("t").asc()
    )
    return (
        bucket_peaks.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("conc").cast("bigint").alias("peak_concurrency"),
            F.col("t").alias("peak_at"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------- schema drift


@query(
    "dq_schema_drift",
    group="dq",
    oracle=f"""
WITH h1 AS (SELECT * FROM {EVENTS_V} WHERE ts <  TIMESTAMP '2024-01-16'),
     h2 AS (SELECT * FROM {EVENTS_V} WHERE ts >= TIMESTAMP '2024-01-16'),
p1 AS (
  SELECT count(*) AS n,
         round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 6) AS null_frac_value,
         count(DISTINCT event_type) AS ndv_event_type,
         count(DISTINCT user_id) AS ndv_user_id,
         {DAVG_SQL.format(x="value")} AS mean_value
  FROM h1
), p2 AS (
  SELECT count(*) AS n,
         round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 6) AS null_frac_value,
         count(DISTINCT event_type) AS ndv_event_type,
         count(DISTINCT user_id) AS ndv_user_id,
         {DAVG_SQL.format(x="value")} AS mean_value
  FROM h2
), m AS (
  SELECT 'n_rows' AS metric, CAST(p1.n AS DOUBLE) AS before,
         CAST(p2.n AS DOUBLE) AS after FROM p1, p2
  UNION ALL
  SELECT 'null_frac_value', p1.null_frac_value, p2.null_frac_value FROM p1, p2
  UNION ALL
  SELECT 'ndv_event_type', CAST(p1.ndv_event_type AS DOUBLE),
         CAST(p2.ndv_event_type AS DOUBLE) FROM p1, p2
  UNION ALL
  SELECT 'ndv_user_id', CAST(p1.ndv_user_id AS DOUBLE),
         CAST(p2.ndv_user_id AS DOUBLE) FROM p1, p2
  UNION ALL
  SELECT 'mean_value', p1.mean_value, p2.mean_value FROM p1, p2
)
SELECT metric, before, after,
       round(abs(after - before) / NULLIF(abs(before), 0), 6) AS rel_change,
       CAST(CASE WHEN abs(after - before) > 0.10 * abs(before)
                 THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM m ORDER BY metric
""",
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-window schema-profile drift: per-column profile stats
    (row count, null fraction, distinct counts, decimal-exact mean)
    over two time halves of the events stream, unpivoted to one row
    per metric with relative change and a 10% drift flag — the
    monitoring query a warehouse runs on every ingest batch against
    the previous day's profile.

    Scale shape: ONE single-pass aggregate per side (all profile
    stats share a scan), a 5-row unpivot, and a constant-width
    compare — no shuffle beyond the two global aggregates; the NDVs
    would switch to HLL sketches (`agg_hll_rollup`) when exactness
    is not required."""
    ev = load_table(spark, sf_dir, "events")

    def profile(df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").isNull().cast("double")) / F.count("*"), 6
            ).alias("null_frac_value"),
            F.countDistinct("event_type").alias("ndv_event_type"),
            F.countDistinct("user_id").alias("ndv_user_id"),
            davg("value").alias("mean_value"),
        )

    cut = F.lit("2024-01-16").cast("timestamp")
    p1 = profile(ev.filter(F.col("ts") < cut))
    p2 = profile(ev.filter(F.col("ts") >= cut))

    def unpivot(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.explode(
                F.map_from_arrays(
                    F.array(
                        F.lit("n_rows"),
                        F.lit("null_frac_value"),
                        F.lit("ndv_event_type"),
                        F.lit("ndv_user_id"),
                        F.lit("mean_value"),
                    ),
                    F.array(
                        F.col("n").cast("double"),
                        F.col("null_frac_value"),
                        F.col("ndv_event_type").cast("double"),
                        F.col("ndv_user_id").cast("double"),
                        F.col("mean_value"),
                    ),
                )
            ).alias("metric", side)
        )

    m = unpivot(p1, "before").join(unpivot(p2, "after"), "metric")
    return m.select(
        "metric",
        "before",
        "after",
        F.round(
            F.abs(F.col("after") - F.col("before"))
            / F.nullif(F.abs(F.col("before")), F.lit(0.0)),
            6,
        ).alias("rel_change"),
        (
            F.abs(F.col("after") - F.col("before")) > 0.10 * F.abs(F.col("before"))
        )
        .cast("bigint")
        .alias("drifted"),
    ).orderBy("metric")


# ------------------------------------------------- GeoIP-style range lookup

#: 512 contiguous, non-uniform ranges tiling the 10.0.0.0/8 tail used
#: by fn_ip_cidr's synthesizer: boundary i = base + i*32768 + (i*i)%999
#: — deliberately NOT bucket-aligned, so a correct bucketed rewrite
#: must handle ranges spanning two buckets.
_IPR_N = 512
_IPR_BASE = 10 * 16777216
_IPR_BUCKET = 32768

_IPR_BOUNDS_SQL = f"""
  SELECT i AS range_id,
         {_IPR_BASE} + i * {_IPR_BUCKET} + (i * i) % 999 AS lo,
         {_IPR_BASE} + (i + 1) * {_IPR_BUCKET} + ((i + 1) * (i + 1)) % 999 AS hi
  FROM (SELECT unnest(generate_series(0, {_IPR_N - 1})) AS i)
"""


@query(
    "join_range_ip_lookup",
    group="joins",
    oracle=f"""
WITH ips AS (
  SELECT event_id, user_id,
         {_IPR_BASE}
         + (CAST((event_id * 7) % 256 AS BIGINT)) * 65536
         + (CAST((event_id * 13) % 256 AS BIGINT)) * 256
         + (CAST(event_id % 256 AS BIGINT)) AS ip_int
  FROM events
), r AS ({_IPR_BOUNDS_SQL})
SELECT CAST(r.range_id % 16 AS BIGINT) AS region,
       count(*) AS n_events,
       count(DISTINCT ips.user_id) AS n_users,
       count(DISTINCT r.range_id) AS n_ranges,
       min(ips.ip_int) AS min_ip
FROM ips JOIN r ON ips.ip_int >= r.lo AND ips.ip_int < r.hi
GROUP BY 1
ORDER BY region
""",
)
def join_range_ip_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoIP-style point-in-range lookup: each event's synthesized
    IPv4 (same residue arithmetic as fn_ip_cidr) is mapped to one of
    512 contiguous NON-aligned integer ranges (a stand-in for a
    MaxMind-style block table), then rolled up per region.

    Scale shape — the banded rewrite every IP-enrichment job needs:
    each range is exploded to the fixed-width buckets it OVERLAPS
    (<= 2 here since range width < 2 buckets), the probe computes its
    bucket map-side, and the join is a BROADCAST HASH equi-join on
    the bucket with the exact range predicate re-filtered in the same
    stage — never a non-equi BNLJ over the probe.  The oracle runs
    the plain inequality join, so the hash match proves the bucketed
    rewrite covers boundary-spanning ranges exactly.

    At 100 TB: the range table stays dimension-sized (GeoIP ~3M rows
    -> a few buckets per range, still broadcastable); the probe side
    never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    o2 = (F.col("event_id") * 7 % 256).cast("long")
    o3 = (F.col("event_id") * 13 % 256).cast("long")
    o4 = (F.col("event_id") % 256).cast("long")
    probe = ev.select(
        "event_id",
        "user_id",
        (F.lit(_IPR_BASE) + o2 * 65536 + o3 * 256 + o4).alias("ip_int"),
    ).withColumn("bucket", F.floor(F.col("ip_int") / _IPR_BUCKET))
    i = F.col("id")
    ranges = (
        spark.range(0, _IPR_N)
        .select(
            i.alias("range_id"),
            (F.lit(_IPR_BASE) + i * _IPR_BUCKET + (i * i) % 999).alias("lo"),
            (
                F.lit(_IPR_BASE)
                + (i + 1) * _IPR_BUCKET
                + ((i + 1) * (i + 1)) % 999
            ).alias("hi"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / _IPR_BUCKET),
                    F.floor((F.col("hi") - 1) / _IPR_BUCKET),
                )
            ),
        )
    )
    joined = probe.join(F.broadcast(ranges), "bucket").filter(
        (F.col("ip_int") >= F.col("lo")) & (F.col("ip_int") < F.col("hi"))
    )
    return (
        joined.groupBy((F.col("range_id") % 16).cast("bigint").alias("region"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("range_id").alias("n_ranges"),
            F.min("ip_int").alias("min_ip"),
        )
        .orderBy("region")
    )
