"""Data-engineering op guarantees: Misra-Gries bounds, count-min
one-sided error, bloom prune exactness, SCD2 chain invariants, int8
quantization range."""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.tables import load_table


def test_misra_gries_guarantees(spark, sf_dir):
    """Every key with true frequency > n/k survives, every surviving
    estimate is within [true - n/k, true]."""
    from pg_telemetry_spark.queries.dataeng import agg_heavy_hitters_mg

    k = 4
    est = {r.item: r.weight for r in agg_heavy_hitters_mg(spark, sf_dir).collect()}

    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        F.when(F.col("event_id") % 3 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("item")
    )
    true = {r.item: r.cnt for r in keyed.groupBy("item").agg(F.count("*").alias("cnt")).collect()}
    n = sum(true.values())

    for item, cnt in true.items():
        if cnt > n / k:
            assert item in est, f"heavy hitter {item} (freq {cnt} > n/k={n/k}) missing"
    for item, w in est.items():
        assert true[item] - n / k <= w <= true[item], (item, w, true[item], n / k)


def test_cms_never_undercounts(spark, sf_dir):
    from pg_telemetry_spark.queries.dataeng import agg_cms_freq

    rows = agg_cms_freq(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.est_count >= r.exact_count, (r.event_type, r.est_count, r.exact_count)
        assert r.no_undercount == 1


def test_bloom_prune_equals_plain_semi_join(spark, sf_dir):
    """The bloom stage may pass false positives but the exact semi
    join removes them — identical to the un-bloomed join."""
    from pg_telemetry_spark.queries.dataeng import join_bloom_prune

    got = join_bloom_prune(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
    )
    plain = (
        li.join(dim.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .collect()[0]
    )
    assert got.n_lines == plain.n_lines and got.n_lines > 0
    assert got.revenue == plain.revenue


def test_scd2_chain_invariants(spark, sf_dir):
    """Exactly one current row per key; version ranges tile without
    gaps or overlaps."""
    from pg_telemetry_spark.queries.dataeng import wl_scd2_history

    hist = wl_scd2_history(spark, sf_dir)
    per_key = hist.groupBy("o_orderkey").agg(
        F.sum("is_current").alias("n_current"),
        F.count("*").alias("n_versions"),
        F.min("valid_from").alias("first_from"),
    )
    bad = per_key.filter(
        (F.col("n_current") != 1) | (F.col("first_from") != 1)
    ).count()
    assert bad == 0
    # chain continuity: non-current rows end exactly where the next starts
    w_next = F.lead("valid_from").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "o_orderkey"
        ).orderBy("valid_from")
    )
    gaps = (
        hist.withColumn("next_from", w_next)
        .filter(F.col("is_current") == 0)
        .filter(F.col("valid_to") != F.col("next_from") - 1)
        .count()
    )
    assert gaps == 0


def test_embed_quantize_int8_range(spark, sf_dir):
    from pg_telemetry_spark.queries.dataeng import llm_embed_quantize

    rows = llm_embed_quantize(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 < r.scale
        assert r.qmax_abs <= 127
