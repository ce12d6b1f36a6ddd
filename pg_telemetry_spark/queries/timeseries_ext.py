"""Time-series depth + text-retrieval operators: counter-reset-aware
rates, tolerance-bounded as-of enrichment, visualization decimation
(min/max and LTTB), BM25 ranking, and an inverted index build.

The counter/gauge distinction is the core of telemetry ingestion: a
monotonic counter that wraps or restarts must contribute its
post-reset value, not a negative delta.  The retrieval pair (BM25 +
posting lists) is the lexical half of every hybrid search stack; the
fixture documents are whitespace-tokenized so the tokenizer is shared
with llm_tokenize."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.operators.asof import asof_join
from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "ts_counter_reset",
    group="timeseries",
    oracle=f"""
WITH samples AS (
  SELECT user_id, ts, event_id,
         sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)
           % CAST(500 AS DECIMAL(18,6)) AS counter
  FROM {EVENTS_V} e
), deltas AS (
  SELECT user_id,
         counter - lag(counter) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS delta,
         counter
  FROM samples
)
SELECT user_id,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       round(CAST(sum(CASE WHEN delta < 0 THEN counter ELSE delta END)
                  AS DOUBLE), 6) AS total_increase
FROM deltas
WHERE delta IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
)
def ts_counter_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus/tsdb-style increase() over a wrapping monotonic
    counter: a sawtooth series is derived per user (running sum of
    event values mod 500 — deterministic, order-pinned), and each
    negative delta is treated as a RESET contributing the post-reset
    level instead of the (meaningless) negative difference.  One
    window shuffle per series key; the reset logic is a branch-free
    CASE over lag deltas — at 100 TB this is the same shape as any
    per-series window, and the rollup rides the series partitioning.
    The whole chain is EXACT DECIMAL (queries/detsum.py discipline):
    the ordered prefix sum is order-pinned, but the final per-user
    delta sum is NOT — double sums there broke the hash two decades
    above the gate (round-8 sf1 sweep)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counter = F.sum(F.col("value").cast("decimal(18,6)")).over(w) % F.lit(
        500
    ).cast("decimal(18,6)")
    samples = e.select("user_id", "ts", "event_id", counter.alias("counter"))
    delta = F.col("counter") - F.lag("counter").over(w)
    deltas = samples.select("user_id", delta.alias("delta"), "counter").filter(
        F.col("delta").isNotNull()
    )
    return (
        deltas.groupBy("user_id")
        .agg(
            F.sum((F.col("delta") < 0).cast("bigint")).alias("n_resets"),
            F.round(
                F.sum(
                    F.when(F.col("delta") < 0, F.col("counter")).otherwise(
                        F.col("delta")
                    )
                ).cast("double"),
                6,
            ).alias("total_increase"),
        )
        .orderBy("user_id")
    )


@query(
    "join_asof_tol",
    group="joins",
    tier="B",
    oracle=f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM {EVENTS_V} e WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, value FROM {EVENTS_V} e WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       coalesce(CASE WHEN p.ts - c.ts <= INTERVAL 30 MINUTE
                     THEN round(c.value, 6) END, -1.0) AS asof_value,
       CASE WHEN p.ts - c.ts <= INTERVAL 30 MINUTE
            THEN CAST(1 AS INTEGER) ELSE CAST(0 AS INTEGER) END AS matched
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the nearest prior click
    enriches a purchase ONLY if it is at most 30 minutes old —
    older matches surface as NULL (sensor-fusion semantics: a stale
    reading is worse than none).  Same window-union pattern and cost
    as join_asof; the tolerance is a post-carry filter on the carried
    timestamp, not a second join.  Oracle: native DuckDB ASOF JOIN
    with the tolerance applied to its match — identical semantics
    because the nearest-prior row either passes the bound or nothing
    does."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        tolerance_seconds=1800,
    )
    return joined.select(
        "event_id",
        "user_id",
        # -1.0 sentinel: the driver's canonicalizer treats NULL doubles
        # as NaN on the oracle side; `matched` carries the semantics
        F.coalesce(F.round("asof_value", 6), F.lit(-1.0)).alias("asof_value"),
        F.col("asof_value").isNotNull().cast("int").alias("matched"),
    )


@query(
    "ts_minmax_decimate",
    group="timeseries",
    oracle=f"""
WITH pts AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         ts, event_id, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY value ASC, ts ASC, event_id ASC) AS rn_min,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY value DESC, ts ASC, event_id ASC) AS rn_max
  FROM {EVENTS_V} e
)
SELECT bucket, event_type,
       round(min(CASE WHEN rn_min = 1 THEN value END), 6) AS min_value,
       min(CASE WHEN rn_min = 1 THEN ts END) AS min_ts,
       round(min(CASE WHEN rn_max = 1 THEN value END), 6) AS max_value,
       min(CASE WHEN rn_max = 1 THEN ts END) AS max_ts
FROM pts
GROUP BY bucket, event_type
ORDER BY bucket, event_type
""",
)
def ts_minmax_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max decimation — the downsampling every monitoring UI
    actually renders (it provably preserves the visual envelope:
    spikes and dips survive because the extreme POINTS, not bucket
    aggregates, are kept).  Two rank windows over one (bucket, type)
    shuffle pick the extreme point per bucket with full tie-breaks;
    the output is 2 points per bucket per series regardless of input
    density — the property that makes dashboard queries O(pixels),
    not O(samples), at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", "ts").cast("timestamp_ntz")
    w_min = Window.partitionBy(bucket, "event_type").orderBy(
        F.col("value").asc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    w_max = Window.partitionBy(bucket, "event_type").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    pts = e.select(
        bucket.alias("bucket"),
        "event_type",
        "ts",
        "value",
        F.row_number().over(w_min).alias("rn_min"),
        F.row_number().over(w_max).alias("rn_max"),
    )
    return (
        pts.groupBy("bucket", "event_type")
        .agg(
            F.round(F.min(F.when(F.col("rn_min") == 1, F.col("value"))), 6).alias(
                "min_value"
            ),
            F.min(F.when(F.col("rn_min") == 1, F.col("ts"))).alias("min_ts"),
            F.round(F.min(F.when(F.col("rn_max") == 1, F.col("value"))), 6).alias(
                "max_value"
            ),
            F.min(F.when(F.col("rn_max") == 1, F.col("ts"))).alias("max_ts"),
        )
        .orderBy("bucket", "event_type")
    )


@query("ts_lttb", group="timeseries", tier="C")
def ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling to 100 points per
    series — the perceptually-optimal decimation (Steinarsson 2013):
    each bucket keeps the point maximizing the triangle area against
    the previously kept point and the next bucket's centroid.
    Inherently sequential per series ⇒ applyInPandas per (small)
    series key after the same one-shuffle regroup every window op
    pays; each series' samples stream through one Arrow batch.  The
    algorithm is deterministic but not SQL-expressible (the kept
    point depends on the previous choice), hence tier C; the unit
    test pins endpoints, output size, subset-ness and determinism."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    n_out = 100

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[["event_type", "ts", "event_id", "value"]]
        x = pdf["ts"].astype("int64").to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        keep = [0]
        # n_out-2 interior buckets over points 1..n-2
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            ax, ay = x[keep[-1]], y[keep[-1]]
            area = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            keep.append(lo + int(area.argmax()))
        keep.append(n - 1)
        return pdf.iloc[keep][["event_type", "ts", "event_id", "value"]]

    return (
        e.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(lttb, schema="event_type string, ts timestamp, event_id long, value double")
        .orderBy("event_type", "ts", "event_id")
    )


_BM25_TERMS = ("spark", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "llm_bm25",
    group="llm_ext",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), stats AS (
  SELECT doc_id, CAST(len(words) AS DOUBLE) AS dl,
         CAST(len(list_filter(words, x -> x = 'spark')) AS DOUBLE) AS tf_spark,
         CAST(len(list_filter(words, x -> x = 'window')) AS DOUBLE) AS tf_window
  FROM docs
), corpus AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
         sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
  FROM stats
)
SELECT s.doc_id,
       round(
         ln((c.n_docs - c.df_spark + 0.5) / (c.df_spark + 0.5) + 1)
           * s.tf_spark * ({_BM25_K1} + 1)
           / (s.tf_spark + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * s.dl / c.avgdl))
       + ln((c.n_docs - c.df_window + 0.5) / (c.df_window + 0.5) + 1)
           * s.tf_window * ({_BM25_K1} + 1)
           / (s.tf_window + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * s.dl / c.avgdl))
       , 6) AS bm25
FROM stats s CROSS JOIN corpus c
ORDER BY bm25 DESC, s.doc_id ASC
LIMIT 20
""",
)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical ranking for a two-term query — the scoring half
    of hybrid (lexical + vector) retrieval.  Per-doc term frequencies
    and lengths come from one narrow pass over the tokenized text;
    the corpus statistics (N, avgdl, per-term df) aggregate to ONE
    row that broadcasts back, so the scorer is scan → tiny agg →
    broadcast → scan-side arithmetic with a global top-20: no
    shuffle touches the corpus beyond the TakeOrdered.  Okapi
    parameters k1=1.2, b=0.75 pinned in both engines."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stats = d.select(
        "doc_id",
        F.size(words).cast("double").alias("dl"),
        *[
            F.expr(f"CAST(size(filter(split(text, ' '), x -> x = '{t}')) AS DOUBLE)").alias(
                f"tf_{t}"
            )
            for t in _BM25_TERMS
        ],
    )
    corpus = stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5) + 1
        )
        tf = F.col(f"tf_{t}")
        part = (
            idf
            * tf
            * (_BM25_K1 + 1)
            / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    return (
        stats.join(F.broadcast(corpus))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "llm_inverted_index",
    group="llm_ext",
    oracle="""
WITH postings AS (
  SELECT DISTINCT t.term, d.doc_id
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(term)
  WHERE t.term <> ''
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id))[1:15], ',') AS first_postings
FROM postings
GROUP BY term
ORDER BY term
""",
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: explode tokens → distinct (term, doc) →
    per-term document frequency + the first 15 postings (sorted,
    comma-joined so the oracle hashes a scalar).  The distinct and
    the groupBy share the term-keyed shuffle; posting lists stay
    bounded in the RESULT only — the full index at scale is the
    un-sliced aggregation written out partitioned by term hash, and
    df is exactly the per-term partial count a query planner uses to
    order AND-term intersection."""
    d = load_table(spark, sf_dir, "documents")
    postings = (
        d.select(F.explode(F.split("text", " ")).alias("term"), "doc_id")
        .filter(F.col("term") != "")
        .distinct()
    )
    return (
        postings.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 15), ","
            ).alias("first_postings"),
        )
        .orderBy("term")
    )


@query(
    "llm_rrf_fusion",
    group="llm_ext",
    tier="B",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), stats AS (
  SELECT doc_id, CAST(len(words) AS DOUBLE) AS dl,
         CAST(len(list_filter(words, x -> x = 'spark')) AS DOUBLE) AS tf_spark,
         CAST(len(list_filter(words, x -> x = 'window')) AS DOUBLE) AS tf_window
  FROM docs
), corpus AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
         sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
  FROM stats
), lex AS (
  SELECT s.doc_id,
         row_number() OVER (ORDER BY round(
           ln((c.n_docs - c.df_spark + 0.5) / (c.df_spark + 0.5) + 1)
             * s.tf_spark * 2.2
             / (s.tf_spark + 1.2 * (0.25 + 0.75 * s.dl / c.avgdl))
         + ln((c.n_docs - c.df_window + 0.5) / (c.df_window + 0.5) + 1)
             * s.tf_window * 2.2
             / (s.tf_window + 1.2 * (0.25 + 0.75 * s.dl / c.avgdl)), 6) DESC,
           s.doc_id ASC) AS lex_rank
  FROM stats s CROSS JOIN corpus c
), vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), probe AS (
  SELECT v AS pv FROM vecs WHERE vec_id = 0
), vec AS (
  SELECT d.doc_id,
         row_number() OVER (ORDER BY round(list_dot_product(p.pv, vv.v), 6) DESC,
                            d.doc_id ASC) AS vec_rank
  FROM documents d
  JOIN vecs vv ON vv.vec_id = d.doc_id
  CROSS JOIN probe p
)
SELECT l.doc_id,
       CAST(l.lex_rank AS BIGINT) AS lex_rank,
       CAST(v.vec_rank AS BIGINT) AS vec_rank,
       round(1.0 / (60 + l.lex_rank) + 1.0 / (60 + v.vec_rank), 9) AS rrf
FROM lex l JOIN vec v ON l.doc_id = v.doc_id
ORDER BY rrf DESC, l.doc_id ASC
LIMIT 15
""",
)
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion (RRF, k=60): the BM25 lexical
    ranking and the embedding-cosine ranking over the same corpus
    fuse by reciprocal rank — the standard way to combine
    incomparable score scales without calibration.  Both rankings
    are global windows over corpus-sized frames (each already
    reduced from the raw data by broadcast-joined statistics), the
    fusion is a doc_id equi-join of two slim (doc_id, rank) frames,
    and the top-15 is a TakeOrdered.  Ranks are taken on round-6
    scores with doc_id tie-breaks so both engines rank identically
    (the same discipline llm_cosine_topk pins)."""
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    words = F.split("text", " ")
    stats = d.select(
        "doc_id",
        F.size(words).cast("double").alias("dl"),
        *[
            F.expr(f"CAST(size(filter(split(text, ' '), x -> x = '{t}')) AS DOUBLE)").alias(
                f"tf_{t}"
            )
            for t in _BM25_TERMS
        ],
    )
    corpus = stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5) + 1
        )
        tf = F.col(f"tf_{t}")
        part = (
            idf
            * tf
            * (_BM25_K1 + 1)
            / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    w_lex = Window.orderBy(F.round(score, 6).desc(), F.col("doc_id").asc())
    lex = (
        stats.join(F.broadcast(corpus))
        .select("doc_id", F.row_number().over(w_lex).alias("lex_rank"))
    )

    as_double = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    vecs = emb.select("vec_id", as_double.alias("v"))
    probe = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("pv"))
    dot = F.expr("aggregate(zip_with(pv, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)")
    w_vec = Window.orderBy(F.round(dot, 6).desc(), F.col("doc_id").asc())
    vec = (
        d.select("doc_id")
        .join(vecs, F.col("doc_id") == vecs.vec_id)
        .join(F.broadcast(probe))
        .select("doc_id", F.row_number().over(w_vec).alias("vec_rank"))
    )

    rrf = 1.0 / (60 + F.col("lex_rank")) + 1.0 / (60 + F.col("vec_rank"))
    return (
        lex.join(vec, "doc_id")
        .select(
            "doc_id",
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("vec_rank").cast("bigint").alias("vec_rank"),
            F.round(rrf, 9).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(15)
    )


@query(
    "ts_slo_burn",
    group="timeseries",
    oracle=f"""
WITH hourly AS (
  SELECT CAST(user_id % 4 AS INT) AS service,
         date_trunc('hour', ts) AS bucket,
         count(*) AS n_events,
         count(*) FILTER (WHERE event_type = 'error') AS n_errors
  FROM {EVENTS_V} e
  GROUP BY 1, 2
), roll AS (
  SELECT service, bucket, n_events, n_errors,
         sum(n_events) OVER w6 AS n_events_6h,
         sum(n_errors) OVER w6 AS n_errors_6h
  FROM hourly
  WINDOW w6 AS (PARTITION BY service
                ORDER BY CAST(epoch(bucket) AS BIGINT) // 3600
                RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT service, bucket, n_events, n_errors,
       round(CAST(n_errors AS DOUBLE) / n_events / 0.25, 6) AS burn_1h,
       round(CAST(n_errors_6h AS DOUBLE) / n_events_6h / 0.25, 6) AS burn_6h,
       (round(CAST(n_errors AS DOUBLE) / n_events / 0.25, 6) > 1.0
        AND round(CAST(n_errors_6h AS DOUBLE) / n_events_6h / 0.25, 6) > 1.0)
           AS alert
FROM roll
""",
)
def ts_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO error-budget burn rate — the canonical
    telemetry alerting query (SRE multiwindow multi-burn): per
    service, the 1-hour and rolling-6-hour error rates divided by the
    error budget (25%), alerting only when BOTH windows burn hot —
    the short window for responsiveness, the long one to suppress
    blips.

    Scale: one hash aggregate collapses the fact table to hourly
    per-service partials FIRST; the 6-hour window then runs on the
    tiny pre-aggregated series (a RANGE frame over epoch-hours, so
    calendar gaps cannot misalign the window the way a ROWS frame
    would).  The window partitions by service — at fleet scale that
    is thousands of independent series, so no single-partition
    bottleneck; the fact table itself is never re-scanned or
    re-shuffled for the long window."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            (F.col("user_id") % 4).cast("int").alias("service"),
            F.date_trunc("hour", "ts").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
        )
    )
    hour_key = F.expr("unix_timestamp(cast(bucket as timestamp)) div 3600")
    w6 = (
        Window.partitionBy("service")
        .orderBy(hour_key)
        .rangeBetween(-5, Window.currentRow)
    )
    rolled = hourly.select(
        "service",
        "bucket",
        "n_events",
        "n_errors",
        F.sum("n_events").over(w6).alias("n_events_6h"),
        F.sum("n_errors").over(w6).alias("n_errors_6h"),
    )
    burn_1h = F.round(F.col("n_errors").cast("double") / F.col("n_events") / 0.25, 6)
    burn_6h = F.round(
        F.col("n_errors_6h").cast("double") / F.col("n_events_6h") / 0.25, 6
    )
    return rolled.select(
        "service",
        "bucket",
        "n_events",
        "n_errors",
        burn_1h.alias("burn_1h"),
        burn_6h.alias("burn_6h"),
        ((burn_1h > 1.0) & (burn_6h > 1.0)).alias("alert"),
    )


@query(
    "ts_cusum_change",
    group="timeseries",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts, event_id, value FROM {EVENTS_V} e
  WHERE value IS NOT NULL
), mu AS (
  SELECT user_id,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
              // count(value) AS DOUBLE) / 100.0 AS mu
  FROM e GROUP BY user_id
), pre AS (
  SELECT e.user_id, e.ts, e.event_id,
         sum(CAST(CAST(e.value - mu.mu - 5.0 AS DECIMAL(18,6)) * 1000000
                  AS BIGINT))
           OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM e JOIN mu USING (user_id)
), cusum AS (
  SELECT user_id, ts, event_id,
         p - least(CAST(0 AS BIGINT),
                   min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)) AS s
  FROM pre
)
SELECT user_id,
       count(*) AS n_samples,
       round(CAST(max(s) AS DOUBLE) / 1000000, 6) AS max_cusum,
       CAST(sum(CASE WHEN s > 200000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms
FROM cusum
GROUP BY user_id
""",
)
def ts_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection per telemetry series
    (Page 1954): s_i = max(0, s_{i-1} + (x_i - mu - k)) flags a
    sustained upward level shift; we report each user's peak CUSUM
    and how many samples exceeded the alarm threshold h.

    The recursion has the closed form s_i = P_i - min(0, min_{j<=i}
    P_j) over the drift-adjusted prefix sum P, so the whole operator
    is two ordered window aggregates over one per-series shuffle — no
    iteration, no UDF, and at 100 TB it is the same single-exchange
    shape as any per-series window chain (series key partitions the
    work; AQE handles skewed users).

    Determinism: the per-user mean is PURE INTEGER arithmetic —
    exact decimal cents summed, floor-divided by the count — because
    the round-8 sf1 sweep showed even round(double, 2) diverges
    between engines at boundary quotients; with an integer-cent mean
    the drift adjustment is identical IEEE math on identical
    operands, and the prefix sum/running min accumulate INTEGER MICROS — exact, order-independent, hash-stable at
    any scale (the round-8 sf1 sweep showed double window sums are
    safe but double group sums are not; decimals everywhere cost
    nothing here and remove the risk class entirely)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    cents = (
        F.sum(F.col("value").cast("decimal(18,2)")) * 100
    ).cast("bigint")
    mu = e.groupBy("user_id").agg(
        (
            (cents - F.pmod(cents, F.count("value"))) / F.count("value")
        ).cast("double").alias("_mu_cents")
    ).select("user_id", (F.col("_mu_cents") / F.lit(100.0)).alias("mu"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    y_micro = (
        (F.col("value") - F.col("mu") - F.lit(5.0)).cast("decimal(18,6)")
        * 1_000_000
    ).cast("bigint")
    pre = e.join(mu, "user_id").withColumn("p", F.sum(y_micro).over(w))
    s = F.col("p") - F.least(F.lit(0).cast("bigint"), F.min("p").over(w))
    return (
        pre.withColumn("s", s)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.max("s").cast("double") / 1_000_000, 6).alias(
                "max_cusum"
            ),
            F.sum(F.when(F.col("s") > 200_000_000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_alarms"),
        )
    )


@query(
    "ts_acf",
    group="timeseries",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1e6, 6) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), m AS (
  SELECT event_type, count(*) AS n_hours,
         round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
             AS mean_v
  FROM hourly GROUP BY event_type
), dd AS (
  SELECT h.event_type, m.n_hours, m.mean_v, h.v - m.mean_v AS d,
         lag(h.v - m.mean_v, 1) OVER w AS d1,
         lag(h.v - m.mean_v, 2) OVER w AS d2,
         lag(h.v - m.mean_v, 3) OVER w AS d3
  FROM hourly h JOIN m USING (event_type)
  WINDOW w AS (PARTITION BY h.event_type ORDER BY h.hr)
)
SELECT event_type, any_value(n_hours) AS n_hours,
       any_value(mean_v) AS mean_v,
       round(CAST(sum(CAST(round(d * d1, 6) AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(round(d * d, 6) AS DECIMAL(38,6))) AS DOUBLE),
             6) AS acf_lag1,
       round(CAST(sum(CAST(round(d * d2, 6) AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(round(d * d, 6) AS DECIMAL(38,6))) AS DOUBLE),
             6) AS acf_lag2,
       round(CAST(sum(CAST(round(d * d3, 6) AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(round(d * d, 6) AS DECIMAL(38,6))) AS DOUBLE),
             6) AS acf_lag3
FROM dd GROUP BY event_type
""",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at observation lags 1-3 per
    event-type hourly series — the classic seasonality/persistence
    diagnostic a telemetry engine runs before fitting any forecast
    (Box & Jenkins): r_k = sum((x_t - mean)(x_{t-k} - mean)) /
    sum((x_t - mean)^2), full-series denominator.

    Float-order discipline (the decade-up lesson): hourly values are
    EXACT integer-micro sums rounded once; the mean comes from an
    exact DECIMAL(18,6) sum; every cross-product is rounded to 6
    decimals and accumulated as DECIMAL(38,6), so no engine ever sums
    raw doubles in partition order.  Shape at 100 TB: one hash agg to
    hourly grain (the big shuffle, on (type, hour)), then windows and
    the final agg run per-series — thousands of independent series
    partitions, none global."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.round(
                F.sum(F.round(F.col("value") * 1000000, 0).cast("bigint"))
                / 1e6,
                6,
            ).alias("v")
        )
    )
    m = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.round(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_v"),
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    d = F.col("v") - F.col("mean_v")
    dd = hourly.join(F.broadcast(m), "event_type").select(
        "event_type",
        "n_hours",
        "mean_v",
        d.alias("d"),
        F.lag(d, 1).over(w).alias("d1"),
        F.lag(d, 2).over(w).alias("d2"),
        F.lag(d, 3).over(w).alias("d3"),
    )

    def _acf(lagcol: str) -> F.Column:
        num = F.sum(
            F.round(F.col("d") * F.col(lagcol), 6).cast("decimal(38,6)")
        )
        den = F.sum(F.round(F.col("d") * F.col("d"), 6).cast("decimal(38,6)"))
        return F.round(num.cast("double") / den.cast("double"), 6)

    return dd.groupBy("event_type").agg(
        F.first("n_hours").alias("n_hours"),
        F.first("mean_v").alias("mean_v"),
        _acf("d1").alias("acf_lag1"),
        _acf("d2").alias("acf_lag2"),
        _acf("d3").alias("acf_lag3"),
    )


@query(
    "ts_seasonal_decompose",
    group="timeseries",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS v
  FROM {EVENTS_V} e GROUP BY 1
), tr AS (
  SELECT h, v,
         CAST(sum(CAST(v AS DECIMAL(18,6)))
              OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              AS DOUBLE) / 25 AS trend,
         count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS wn
  FROM hourly
)
SELECT CAST(extract(hour FROM h) AS INT) AS hod,
       count(*) AS n_hours,
       round(CAST(sum(CAST(v - trend AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS seasonal,
       round(CAST(sum(CAST(abs(v - trend) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_abs_detrended
FROM tr WHERE wn = 25
GROUP BY 1
""",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical (moving-average) seasonal decomposition of the hourly
    event-value series: trend = centered 25-hour moving average
    (full-window rows only, so edges don't bias it), seasonal index =
    mean detrended value per hour-of-day, plus the mean absolute
    detrended magnitude as the residual-scale diagnostic.

    Scale shape: the hourly rollup is one hash agg (decimal-exact per
    the detsum discipline); the moving average is a ROWS window over
    the compact hourly table — at 100 TB the window runs over
    hours-not-events (8.8k rows/year regardless of corpus size), so
    the decomposition costs one agg over raw data plus epsilon.  The
    hour-of-day regroup is a 24-key agg with decimal-exact sums
    (order-independent across partitions/retries)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    # decimal-exact frame sum: DuckDB computes sliding windows with a
    # segment tree, Spark with a running buffer — float order differs,
    # decimals don't (detsum discipline applied to the window frame)
    tr = hourly.select(
        "h",
        "v",
        (
            F.sum(F.col("v").cast("decimal(18,6)")).over(w).cast("double") / 25
        ).alias("trend"),
        F.count("*").over(w).alias("wn"),
    )
    det = F.col("v") - F.col("trend")
    return (
        tr.filter(F.col("wn") == 25)
        .groupBy(F.hour("h").alias("hod"))
        .agg(
            F.count("*").alias("n_hours"),
            F.round(
                F.sum(det.cast("decimal(18,6)")).cast("double") / F.count("*"), 6
            ).alias("seasonal"),
            F.round(
                F.sum(F.abs(det).cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_abs_detrended"),
        )
    )


@query("ts_holt_forecast", group="timeseries", tier="C")
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing per event-type hourly
    series (alpha=0.5, beta=0.3, level/trend initialized from the
    first two observations), with the 24-hour-ahead forecast — the
    capacity-planning extrapolation dashboards run on counter series.

    Scale shape: the hourly rollup is one hash agg over raw events;
    the smoothing recursion is inherently sequential PER SERIES, so
    it runs inside applyInPandas — one shuffle on the series key,
    each series a numpy fold in its own task (at 100 TB: thousands of
    independent series smooth in parallel; no series ever crosses a
    partition).  Tier C: golden test re-runs the recursion locally
    (tests/test_units_timeseries_ext.py)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )

    def holt(key, pdf):
        pdf = pdf.sort_values("h")
        v = pdf["v"].to_numpy(dtype="float64")
        if len(v) < 2:
            return pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_hours": [len(v)],
                    "level": [float(v[0]) if len(v) else None],
                    "trend": [0.0],
                    "forecast_24h": [float(v[0]) if len(v) else None],
                }
            )
        alpha, beta = 0.5, 0.3
        level, trend = v[0], v[1] - v[0]
        for x in v[1:]:
            prev = level
            level = alpha * x + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        return pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_hours": [len(v)],
                "level": [round(level, 6)],
                "trend": [round(trend, 6)],
                "forecast_24h": [round(level + 24 * trend, 6)],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        holt,
        schema=(
            "event_type string, n_hours long, level double, "
            "trend double, forecast_24h double"
        ),
    )


@query(
    "ts_stl_anomaly",
    group="timeseries",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS v
  FROM {EVENTS_V} e GROUP BY 1
), tr AS (
  SELECT h, v,
         CAST(sum(CAST(v AS DECIMAL(18,6)))
              OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              AS DOUBLE) / 25 AS trend,
         count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS wn
  FROM hourly
), full_w AS (
  SELECT h, v, trend,
         CAST(extract(hour FROM h) AS INT) AS hod,
         round(v - trend, 6) AS det
  FROM tr WHERE wn = 25
), seas AS (
  SELECT hod,
         round(CAST(sum(CAST(det AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS s
  FROM full_w GROUP BY hod
), resid AS (
  SELECT f.h, f.v, round(f.det - s.s, 6) AS r
  FROM full_w f JOIN seas s ON f.hod = s.hod
), scale AS (
  SELECT round(sqrt(CAST(sum(CAST(round(r * r, 6) AS DECIMAL(18,6)))
                         AS DOUBLE) / count(*)), 6) AS sd
  FROM resid
)
SELECT r.h, r.v, r.r AS residual,
       round(abs(r.r) / scale.sd, 6) AS score
FROM resid r CROSS JOIN scale
WHERE abs(r.r) > 3 * scale.sd
ORDER BY abs(r.r) DESC, r.h LIMIT 10
""",
)
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decomposition-residual anomaly detection — the STL-style
    pipeline on top of ts_seasonal_decompose's components: residual =
    hourly value - moving-average trend - hour-of-day seasonal index;
    hours where |residual| exceeds 3x the residual RMS are anomalies
    (top-10 by magnitude).  Catches deviations a plain z-score misses
    because the expected diurnal swing is subtracted first.

    Scale shape: identical to ts_seasonal_decompose (one raw-data
    agg, then hours-cardinality windows/joins) plus a broadcast 24-row
    seasonal join and a broadcast 1-row RMS scalar; every float
    boundary is rounded-then-decimal-accumulated so the 3-sigma
    threshold compares IDENTICAL doubles on both engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    tr = hourly.select(
        "h",
        "v",
        (
            F.sum(F.col("v").cast("decimal(18,6)")).over(w).cast("double") / 25
        ).alias("trend"),
        F.count("*").over(w).alias("wn"),
    )
    full_w = tr.filter(F.col("wn") == 25).select(
        "h",
        "v",
        "trend",
        F.hour("h").alias("hod"),
        F.round(F.col("v") - F.col("trend"), 6).alias("det"),
    )
    seas = full_w.groupBy("hod").agg(
        F.round(
            F.sum(F.col("det").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("s")
    )
    resid = full_w.join(F.broadcast(seas), "hod").select(
        "h", "v", F.round(F.col("det") - F.col("s"), 6).alias("r")
    )
    scale = resid.agg(
        F.round(
            F.sqrt(
                F.sum(F.round(F.col("r") * F.col("r"), 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ),
            6,
        ).alias("sd")
    )
    return (
        resid.crossJoin(F.broadcast(scale))
        .filter(F.abs("r") > 3 * F.col("sd"))
        .select(
            "h",
            "v",
            F.col("r").alias("residual"),
            F.round(F.abs("r") / F.col("sd"), 6).alias("score"),
        )
        .orderBy(F.abs("residual").desc(), "h")
        .limit(10)
    )


@query("ts_kalman_smooth", group="timeseries", tier="C")
def ts_kalman_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D random-walk Kalman filter per event-type hourly series
    (process noise Q=0.01, observation noise R=1.0, state initialized
    at the first observation with unit variance) — the standard
    online denoiser for counter series; reports per series the final
    state estimate, its variance, and the mean absolute innovation
    (the filter's own surprise measure, a drift signal).

    Scale shape: the hourly rollup is one hash agg; the filter
    recursion is inherently sequential PER SERIES so it runs inside
    applyInPandas — one shuffle on the series key, each series a
    numpy fold in its own task; thousands of series smooth in
    parallel and no series crosses a partition (same shape as
    ts_holt_forecast).  Tier C: golden replays the recursion in local
    python (tests/test_units_timeseries_ext.py)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )

    def kalman(key, pdf):
        pdf = pdf.sort_values("h")
        v = pdf["v"].to_numpy(dtype="float64")
        q, r = 0.01, 1.0
        x, p = float(v[0]), 1.0
        abs_innov = 0.0
        for z in v[1:]:
            p += q
            kgain = p / (p + r)
            innov = float(z) - x
            x += kgain * innov
            p *= 1.0 - kgain
            abs_innov += abs(innov)
        n = len(v)
        return pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_hours": [n],
                "state": [round(x, 6)],
                "variance": [round(p, 6)],
                "mean_abs_innovation": [
                    round(abs_innov / (n - 1), 6) if n > 1 else 0.0
                ],
            }
        )

    out_schema = (
        "event_type string, n_hours long, state double, variance double, "
        "mean_abs_innovation double"
    )
    return (
        hourly.groupBy("event_type")
        .applyInPandas(kalman, schema=out_schema)
        .orderBy("event_type")
    )


@query(
    "ts_interval_union",
    group="timeseries",
    oracle=f"""
WITH iv AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + greatest(CAST(floor(value) AS BIGINT), 1) AS end_s
  FROM {EVENTS_V} e
), flagged AS (
  SELECT event_type, event_id, start_s, end_s,
         CASE WHEN start_s <= max(end_s) OVER (
                PARTITION BY event_type
                ORDER BY start_s, end_s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS is_new
  FROM iv
), islands AS (
  SELECT event_type, start_s, end_s,
         sum(is_new) OVER (PARTITION BY event_type
                           ORDER BY start_s, end_s, event_id) AS island_id
  FROM flagged
), merged AS (
  SELECT event_type, island_id,
         min(start_s) AS i_start, max(end_s) AS i_end,
         count(*) AS n_raw
  FROM islands GROUP BY event_type, island_id
)
SELECT event_type,
       CAST(sum(n_raw) AS BIGINT) AS n_intervals,
       count(*) AS n_islands,
       CAST(sum(i_end - i_start) AS BIGINT) AS covered_s,
       max(i_end - i_start) AS max_island_s
FROM merged GROUP BY event_type ORDER BY event_type
""",
)
def ts_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (coverage) per event type — the classic
    gaps-and-islands merge: each event spans
    ``[floor(epoch(ts)), floor(epoch(ts)) + max(floor(value), 1))``
    seconds; overlapping or touching spans merge into islands and the
    report is raw-interval count, island count, total covered seconds
    and the widest island.

    Scale shape: one window over (event_type)-partitioned data — the
    partition count is the parallelism unit, and within a partition
    the running-max-end prefix scan is the textbook O(n log n)
    sort-based interval union (no self-join, no explode of the time
    domain, which an interval-overlap join would need).  All
    arithmetic is integer seconds, so the hash match is exact at any
    scale.  Touching intervals (start == running max end) merge —
    half-open [s, e) adjacency convention, documented so both engines
    agree on the boundary."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("start_s"),
        (
            F.unix_timestamp("ts")
            + F.greatest(F.floor("value").cast("bigint"), F.lit(1))
        ).alias("end_s"),
    )
    order = [F.col("start_s"), F.col("end_s"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(
            F.col("start_s") <= F.max("end_s").over(w_prev), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island_id", F.sum("is_new").over(w_run))
    merged = islands.groupBy("event_type", "island_id").agg(
        F.min("start_s").alias("i_start"),
        F.max("end_s").alias("i_end"),
        F.count("*").alias("n_raw"),
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.sum("n_raw").alias("n_intervals"),
            F.count("*").alias("n_islands"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_s"),
            F.max(F.col("i_end") - F.col("i_start")).alias("max_island_s"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_downsample_m4",
    group="timeseries",
    oracle=f"""
WITH pix AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS bucket,
         value, ts, event_id
  FROM {EVENTS_V} e
)
SELECT event_type, bucket,
       count(*) AS n,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000
                            + event_id), 6) AS v_first,
       round(arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000
                            + event_id), 6) AS v_last
FROM pix GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    (series, pixel-column) keep exactly the min, max, FIRST and LAST
    values — the four points that make a line chart render
    pixel-identically to the full-resolution series.  Pixel columns
    are 6-hour buckets of integer epoch seconds.

    vs ``ts_minmax_decimate`` (min/max only) and ``ts_lttb``
    (perceptual, tier C): M4 is the exact-error-bound variant and
    stays tier A.  First/last are ``min_by``/``max_by`` over a
    composite (epoch-microsecond, event_id) DECIMAL key (a total
    order, so ties are impossible) — unsorted single-pass aggregates,
    no sort window; one hash aggregate on (series, bucket) is the
    whole plan at any scale."""
    e = load_table(spark, sf_dir, "events")
    pix = e.select(
        "event_type",
        (F.unix_timestamp("ts") / F.lit(21600)).cast("bigint").alias("bucket"),
        "value",
        (
            F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
            * F.lit(10000000)
            + F.col("event_id")
        ).alias("t_key"),
    )
    key = F.col("t_key")
    return (
        pix.groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
            F.round(F.min_by("value", key), 6).alias("v_first"),
            F.round(F.max_by("value", key), 6).alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "ts_sax_symbolic",
    group="timeseries",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS v
  FROM {EVENTS_V} e GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         count(*) AS n_hours,
         CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mu,
         CAST(sum(CAST(round(v * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS ex2
  FROM hourly GROUP BY event_type
), z AS (
  SELECT h.event_type, h.h, s.n_hours,
         round((h.v - s.mu)
               / sqrt(greatest(s.ex2 - s.mu * s.mu, 1e-12)), 12) AS z,
         row_number() OVER (PARTITION BY h.event_type ORDER BY h.h) - 1
           AS idx
  FROM hourly h JOIN stats s ON s.event_type = h.event_type
), paa AS (
  SELECT event_type, n_hours, (idx * 8) // n_hours AS seg,
         round(CAST(sum(CAST(z AS DECIMAL(20,12))) AS DOUBLE)
               / count(*), 9) AS z_seg
  FROM z GROUP BY event_type, n_hours, (idx * 8) // n_hours
), sym AS (
  SELECT event_type, n_hours, seg,
         CASE WHEN z_seg < -0.6745 THEN 'a'
              WHEN z_seg < 0.0 THEN 'b'
              WHEN z_seg < 0.6745 THEN 'c'
              ELSE 'd' END AS s
  FROM paa
)
SELECT event_type, n_hours,
       string_agg(s, '' ORDER BY seg) AS sax_word
FROM sym GROUP BY event_type, n_hours ORDER BY event_type
""",
)
def ts_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic aggregation (Lin et al. 2003): each event type's
    hourly-mean series is z-normalized, Piecewise-Aggregate-
    Approximated into 8 segments, and mapped onto a 4-symbol alphabet
    at the standard-normal quartile breakpoints (±0.6745, 0) — the
    representation behind symbolic time-series indexing/motif search.

    Determinism: every mean on the path (hourly, series, segment) is
    an exact-decimal sum divided by a count; the single sqrt and the
    breakpoint CASE see bit-identical doubles on both engines, and
    rounding z to 12 decimals before the PAA re-aggregation keeps the
    decimal discipline transitive.  Scale shape: three hash
    aggregates, one series-partitioned window for the index — the
    alphabet mapping and word assembly are per-group folds over 8
    rows."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (F.unix_timestamp("ts") / F.lit(3600)).cast("bigint").alias("h"),
            F.col("value").cast("decimal(18,6)").alias("vd"),
        )
        .groupBy("event_type", "h")
        .agg(
            F.round(F.sum("vd").cast("double") / F.count("*"), 6).alias("v")
        )
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        (F.sum(F.col("v").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
            "mu"
        ),
        (
            F.sum(F.round(F.col("v") * F.col("v"), 6).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("ex2"),
    )
    w_idx = Window.partitionBy("event_type").orderBy("h")
    z = (
        hourly.join(stats, "event_type")
        .select(
            "event_type",
            "n_hours",
            "h",
            F.round(
                (F.col("v") - F.col("mu"))
                / F.sqrt(
                    F.greatest(
                        F.col("ex2") - F.col("mu") * F.col("mu"), F.lit(1e-12)
                    )
                ),
                12,
            ).alias("z"),
        )
        .withColumn("idx", F.row_number().over(w_idx) - 1)
    )
    paa = (
        z.withColumn("seg", F.expr("(idx * 8) div n_hours"))
        .groupBy("event_type", "n_hours", "seg")
        .agg(
            F.round(
                F.sum(F.col("z").cast("decimal(20,12)")).cast("double")
                / F.count("*"),
                9,
            ).alias("z_seg")
        )
    )
    sym = paa.select(
        "event_type",
        "n_hours",
        "seg",
        F.when(F.col("z_seg") < -0.6745, F.lit("a"))
        .when(F.col("z_seg") < 0.0, F.lit("b"))
        .when(F.col("z_seg") < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("s"),
    )
    return (
        sym.groupBy("event_type", "n_hours")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "s"))).getField("s")
            ).alias("sax_word")
        )
        .orderBy("event_type")
    )
