"""LTTB downsampling properties and counter-reset sanity."""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.tables import load_table


def test_lttb_properties(spark, sf_dir):
    """Per series: exactly 100 points (series are larger than that),
    endpoints preserved, every output point exists in the input, and
    the result is deterministic across runs."""
    from pg_telemetry_spark.queries.timeseries_ext import ts_lttb

    out1 = ts_lttb(spark, sf_dir).collect()
    out2 = ts_lttb(spark, sf_dir).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]

    e = load_table(spark, sf_dir, "events")
    full = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.max(F.struct("ts", "event_id")).alias("last"),
        )
        .collect()
    }
    input_ids = {r.event_id for r in e.select("event_id").collect()}

    by_series: dict = {}
    for r in out1:
        by_series.setdefault(r.event_type, []).append(r)
        assert r.event_id in input_ids
    for etype, rows in by_series.items():
        assert full[etype].n > 100
        assert len(rows) == 100
        assert rows[0].event_id == full[etype].first.event_id
        assert rows[-1].event_id == full[etype].last.event_id


def test_counter_reset_totals(spark, sf_dir):
    """increase() over the sawtooth must equal the raw cumulative gain
    (sum of all positive inputs after each user's first event) because
    every wrap's lost 500 is exactly re-added by counting the
    post-reset level plus prior deltas.  Weaker invariant checked
    here: nonneg increases, and resets occur for every active user."""
    from pg_telemetry_spark.queries.timeseries_ext import ts_counter_reset

    rows = ts_counter_reset(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.total_increase >= 0
        assert r.n_resets >= 0
    assert sum(r.n_resets for r in rows) > 0


def test_holt_forecast_matches_local_recursion(spark, sf_dir):
    """Golden for ts_holt_forecast (tier C): re-run the Holt
    level/trend recursion locally over the same hourly series and
    require exact agreement (same float ops, same order)."""
    import pyspark.sql.functions as F

    from pg_telemetry_spark.queries.timeseries_ext import ts_holt_forecast
    from pg_telemetry_spark.tables import load_table

    got = {r["event_type"]: r for r in ts_holt_forecast(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("v")
        )
        .collect()
    )
    series = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["v"]))
    assert set(got) == set(series)
    for et, pts in series.items():
        v = [x for _, x in sorted(pts)]
        level, trend = v[0], v[1] - v[0]
        for x in v[1:]:
            prev = level
            level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.3 * (level - prev) + 0.7 * trend
        assert got[et]["n_hours"] == len(v)
        assert got[et]["level"] == round(level, 6), et
        assert got[et]["trend"] == round(trend, 6), et
        assert got[et]["forecast_24h"] == round(level + 24 * trend, 6), et


def test_kalman_matches_local_recursion(spark, sf_dir):
    """Golden for ts_kalman_smooth (tier C): replay the Q=0.01/R=1
    random-walk filter locally over the same hourly series and
    require exact agreement (same float ops, same order)."""
    import pyspark.sql.functions as F

    from pg_telemetry_spark.queries.timeseries_ext import ts_kalman_smooth
    from pg_telemetry_spark.tables import load_table

    got = {r["event_type"]: r for r in ts_kalman_smooth(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("v")
        )
        .collect()
    )
    series = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["v"]))
    assert set(got) == set(series)
    for et, pts in series.items():
        v = [x for _, x in sorted(pts)]
        q, r_ = 0.01, 1.0
        x, p = v[0], 1.0
        acc = 0.0
        for z in v[1:]:
            p += q
            kg = p / (p + r_)
            innov = z - x
            x += kg * innov
            p *= 1.0 - kg
            acc += abs(innov)
        g = got[et]
        assert g["n_hours"] == len(v)
        assert g["state"] == round(x, 6)
        assert g["variance"] == round(p, 6)
        expect_mai = round(acc / (len(v) - 1), 6) if len(v) > 1 else 0.0
        assert g["mean_abs_innovation"] == expect_mai
