"""Workload-query support tests: approx-quantile error bound and the
salted-join equivalence (salted_agg is oracle-checked directly)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.operators.skew import salted_join_small
from pg_telemetry_spark.tables import load_table


def test_approx_percentile_error_bounded(spark, sf_dir):
    from pg_telemetry_spark.queries.workload import agg_approx_pct

    approx = {r.event_type: (r.p50_approx, r.p95_approx) for r in agg_approx_pct(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in e.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for etype, (p50, p95) in exact.items():
        a50, a95 = approx[etype]
        assert abs(a50 - p50) <= 0.05 * max(p50, 1), (etype, a50, p50)
        assert abs(a95 - p95) <= 0.05 * max(p95, 1), (etype, a95, p95)


def test_salted_join_equals_plain_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    dim = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0), ("purchase", 10.0), ("signup", 2.0), ("view", 0.5)],
        "event_type string, weight double",
    )
    salted = salted_join_small(e, dim, key="event_type", unique_col="event_id", n_salts=8)
    plain = e.join(dim, "event_type")
    assert salted.count() == plain.count()
    s = {(r.event_id, r.weight) for r in salted.collect()}
    p = {(r.event_id, r.weight) for r in plain.collect()}
    assert s == p


def test_hll_rollup_merge_matches_single_pass_and_exact(spark, sf_dir):
    """Union of per-day HLL sketches == single-pass sketch estimate,
    and both within 5% of exact distinct — the re-aggregability
    contract that makes sketch-carrying rollup tables sound."""
    from pg_telemetry_spark.registry import all_queries
    from pg_telemetry_spark.tables import load_table

    merged = {
        r.event_type: r.approx_users_merged
        for r in all_queries()["agg_hll_rollup"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    single = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == single  # merge of partials == one-pass sketch
    for t, n in exact.items():
        assert abs(merged[t] - n) <= max(0.05 * n, 2), (t, merged[t], n)
