"""UDF / UDAF / UDTF surface — SURVEY.md §2.11.

Python is the slow path: row-at-a-time UDFs exist here to document the
cliff, everything else is Arrow-batched (pandas_udf / applyInPandas /
mapInPandas) and each variant cross-validates against a pure-builtin
formulation elsewhere in the registry, so a UDF bug cannot hide.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.queries.timeseries import SESSION_GAP_SECONDS
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "udf_scalar_py",
    group="udfs",
    tier="B",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm_text
FROM documents
""",
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF text normalizer.

    Deliberately the slow path (one Python call per row, pickled row
    transfer) — kept tiny and off the hot path; the builtin equivalent
    is the oracle.  At 100 TB this formulation is banned; use the
    pandas_udf variant below."""

    @F.udf(returnType=T.StringType())
    def normalize(s: str) -> str:
        return " ".join(s.lower().split())

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", normalize("text").alias("norm_text"))


@query(
    "udf_pandas_scalar",
    group="udfs",
    tier="B",
    oracle="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
SELECT e.vec_id, round(list_dot_product(e.v, p.pv), 6) + 0 AS sim_to_probe
FROM e CROSS JOIN p
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF computing dot products against a
    fixed probe vector — cross-validates the builtin zip_with/aggregate
    formulation (llm_cosine_topk core) through the Arrow boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    @pandas_udf(T.DoubleType())
    def dot_probe(vecs: pd.Series) -> pd.Series:
        import numpy as np

        p = np.asarray(probe, dtype="float64")
        # sequential-order sum to match the JVM/DuckDB left fold
        return vecs.map(lambda v: float(np.asarray(v, dtype="float64").dot(p)))

    return emb.select(
        "vec_id", (F.round(dot_probe("embedding"), 6) + 0.0).alias("sim_to_probe")
    )


@query(
    "udf_pandas_agg",
    group="udfs",
    tier="B",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM {EVENTS_V} e
)
SELECT event_type,
       round(avg(value), 6) AS trimmed_mean
FROM ranked
WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
GROUP BY event_type
""",
)
def udf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: 10% trimmed mean of value per type
    (drop floor(n*0.1) from each sorted end)."""

    @pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values().reset_index(drop=True)
        k = int(len(s) * 0.1)
        return float(s.iloc[k : len(s) - k].mean())

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean")
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


@query(
    "udf_grouped_map",
    group="udfs",
    tier="B",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, event_id, ts, value, epoch(ts) AS ep,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= {SESSION_GAP_SECONDS}
              THEN 0 ELSE 1 END AS is_new
  FROM {EVENTS_V} e
), sid AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
  FROM tagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(max(ep) - min(ep), 6) AS duration_seconds,
       round(sum(value), 6) AS sum_value
FROM sid
GROUP BY user_id, session_id
""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-user sessionization — same oracle as
    ts_session, so the pandas formulation and the gaps-and-islands
    window formulation must agree exactly."""

    def sessionize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ep = pdf["ts"].astype("int64") / 1e9  # ns -> seconds
        is_new = (ep.diff() > SESSION_GAP_SECONDS) | ep.diff().isna()
        sid = is_new.cumsum().astype("int64")
        out = pdf.assign(ep=ep, session_id=sid).groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            ep_min=("ep", "min"),
            ep_max=("ep", "max"),
            sum_value=("value", "sum"),
        )
        out["duration_seconds"] = (out["ep_max"] - out["ep_min"]).round(6)
        out["sum_value"] = out["sum_value"].round(6)
        return out[
            [
                "user_id",
                "session_id",
                "session_start",
                "session_end",
                "n_events",
                "duration_seconds",
                "sum_value",
            ]
        ]

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return e.groupBy("user_id").applyInPandas(sessionize_pdf, _SESSION_SCHEMA)


@query("udf_map_batches", group="udfs", tier="C")
def udf_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas as a UDTF-style 1->N expansion: char-5-gram shingle
    generator (the Python-side variant of operators/minhash.py's
    builtin shingling; the unit test asserts they agree)."""

    def gen_shingles(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                text = row["text"]
                grams = {text[i : i + 5] for i in range(max(len(text) - 4, 1))}
                yield pd.DataFrame(
                    {"doc_id": row["doc_id"], "shingle": sorted(grams)}
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("shingle", T.StringType())]
    )
    return d.mapInPandas(gen_shingles, schema)


@query(
    "udf_python_udtf",
    group="udfs",
    tier="B",
    oracle="""
SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS INT) AS value
FROM events
""",
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF exploding a JSON props object into
    (key, value) rows via LATERAL join."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value int")
    class ParseProps:
        def eval(self, props: str):
            for k, v in json.loads(props).items():
                yield k, int(v)

    spark.udtf.register("parse_props", ParseProps)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_udtf_events")
    return spark.sql(
        """
        SELECT e.event_id, p.key, p.value
        FROM _udtf_events e, LATERAL parse_props(e.props) p
        """
    )
