"""Scalar function surface — SURVEY.md §2.8.

String / date / math / array / map / JSON / hash functions, each a
1:1 mapping to ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen — never a Python UDF).  The care here is
oracle-parity traps: 1-based substring/slice on both engines, explicit
date arithmetic instead of engine-specific weekday numbering, float->
double casts before array math, and sequential left-fold order for
array reductions so double addition associates identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "fn_string",
    group="scalars",
    oracle="""
SELECT doc_id,
       upper(lang) AS lang_up,
       lower(source) AS source_lo,
       trim(substring(text, 1, 20)) AS head20,
       concat_ws('|', lang, source) AS lang_source,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad,
       length(text) AS text_len,
       replace(substring(text, 1, 40), 'the', 'THE') AS head_replaced,
       split_part(text, ' ', 1) AS first_word,
       regexp_extract(source, '([0-9]+)', 1) AS source_num,
       regexp_replace(substring(text, 1, 30), '[aeiou]', '_', 'g') AS devoweled,
       levenshtein(lang, 'en') AS lang_dist
FROM documents
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions over the document corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("source_lo"),
        F.trim(F.substring("text", 1, 20)).alias("head20"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.length("text").alias("text_len"),
        F.replace(F.substring("text", 1, 40), F.lit("the"), F.lit("THE")).alias(
            "head_replaced"
        ),
        F.split(F.col("text"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("source", r"([0-9]+)", 1).alias("source_num"),
        F.regexp_replace(F.substring("text", 1, 30), r"[aeiou]", "_").alias("devoweled"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
    )


@query(
    "fn_date",
    group="scalars",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 7 AS dow_explicit,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1)
         AS month_start_date
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions with cross-engine-safe formulations (no
    dayofweek/weekofyear — numbering differs between engines)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        (F.datediff(d, F.lit("1995-01-01").cast("date")) % 7).alias("dow_explicit"),
        F.last_day(d).alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_start_date"
        ),
    )


@query(
    "fn_math",
    group="scalars",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
       round(abs(l_discount - 0.05), 6) AS disc_dev,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(log10(l_extendedprice), 6) AS price_log10,
       round(exp(l_discount), 6) AS disc_exp,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       ((CAST(l_suppkey AS BIGINT) - 50) % 7 + 7) % 7 AS supp_pmod
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (pmod spelled out oracle-side: DuckDB % keeps
    the dividend's sign)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.pmod(F.col("l_suppkey") - 50, F.lit(7)).alias("supp_pmod"),
    )


@query(
    "fn_array",
    group="scalars",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       list_transform(embedding[1:4], x -> round(CAST(x AS DOUBLE), 6) + 0) AS head4,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                         (acc, x) -> acc + x), 6) + 0 AS sum_all,
       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (acc, x) -> acc + x), 6) AS norm2,
       list_sort(list_transform(embedding[1:8], x -> round(CAST(x AS DOUBLE), 3) + 0)) AS head8_sorted,
       range(0, 1 + CAST(label AS BIGINT)) AS label_seq
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings (cast to double
    before arithmetic; left-fold order matches DuckDB's list_reduce so
    double addition associates identically).  norm2 ≈ 1 confirms the
    vectors are unit-normalized."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.transform(F.slice("embedding", 1, 4), lambda x: F.round(x.cast("double"), 6)).alias(
            "head4"
        ),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 6).alias("sum_all"),
        F.round(
            F.aggregate(
                F.zip_with(as_double, as_double, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("norm2"),
        F.array_sort(
            F.transform(F.slice("embedding", 1, 8), lambda x: F.round(x.cast("double"), 3))
        ).alias("head8_sorted"),
        # 0-based: Spark's sequence(a, b) flips to DESCENDING when
        # a > b (label=0 would yield [1, 0]); starting at 0 keeps it
        # ascending for the whole label domain
        F.sequence(F.lit(0).cast("long"), F.col("label").cast("long")).alias("label_seq"),
    )


@query(
    "fn_map",
    group="scalars",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       1 AS n_keys,
       'k' AS first_key,
       CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
FROM events
""",
    tier="B",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON -> MapType -> key/value extraction (the label/tag-map
    idiom for metric dimensions)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_keys(m).getItem(0).alias("first_key"),
        (F.element_at(m, "k") * 2).alias("k_doubled"),
    )


@query(
    "fn_json",
    group="scalars",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract(props, '$') AS VARCHAR) AS json_norm
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + struct round-trip (to_json output normalized
    to DuckDB's compact form)."""
    e = load_table(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.struct(k_int.alias("k"))).alias("json_norm"),
    )


@query(
    "fn_hash",
    group="scalars",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashes for dedup keys (md5/sha256 match cross-engine;
    xxhash64 is Spark-specific and stays internal-only)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )
