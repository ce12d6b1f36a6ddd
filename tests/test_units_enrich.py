"""Unit invariants for the enrichment & matching batch
(queries/enrich_ext.py) beyond the oracle hash-match: the geo grid's
pruning is verified against a local brute force, the entity blocking
against a planted-recall census, and the sweep line against its
half-open boundary convention.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.queries.enrich_ext import (
    _GEO_CELL,
    join_geo_grid,
    ts_concurrency,
    wl_entity_match,
)
from pg_telemetry_spark.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_geo_grid_matches_brute_force(spark):
    """Every point's (nearest_poi, dist2) equals the local argmin over
    ALL POIs — proves the ring pruning + fallback union is exact, not
    just hash-consistent with an oracle built the same way."""
    got = {
        r["pt_id"]: (r["nearest_poi"], r["dist2"])
        for r in join_geo_grid(spark, SF_SMALL).collect()
    }
    cust = load_table(spark, SF_SMALL, "customer").filter(F.col("c_custkey") < 5000)
    supp = load_table(spark, SF_SMALL, "supplier").filter(F.col("s_suppkey") < 500)
    pts = [
        (k, (k * 997 % 6000) / 100.0 - 30.0, (k * 1399 % 6000) / 100.0 - 30.0)
        for k in [r["c_custkey"] for r in cust.select("c_custkey").collect()]
    ]
    poi = [
        (k, (k * 937 % 6000) / 100.0 - 30.0, (k * 1381 % 6000) / 100.0 - 30.0)
        for k in [r["s_suppkey"] for r in supp.select("s_suppkey").collect()]
    ]
    assert len(got) == len(pts)
    for pid, lat, lon in pts:
        best = min(
            (round((lat - a) ** 2 + (lon - b) ** 2, 9), k) for k, a, b in poi
        )
        assert got[pid] == (best[1], best[0]), f"pt {pid}"


def test_geo_grid_exercises_both_paths(spark, sf_dir):
    """At the gate scale the POI density must exercise the
    ring-resolved fast path for the majority of points (a cell size
    mismatched to density would silently route everything through
    the fallback and the grid would be dead weight)."""
    rows = join_geo_grid(spark, sf_dir).collect()
    in_ring = [r for r in rows if r["dist2"] <= _GEO_CELL * _GEO_CELL]
    assert len(in_ring) >= 0.5 * len(rows), "cell size no longer matches density"


def test_entity_match_planted_recall(spark):
    """All three planted 1-edit classes (substitute / delete / insert
    a digit) must be matched at distance <= 1, and the matched
    registry row must BE a true distance-<=1 neighbor (local
    Levenshtein recheck) — blocking recall and verify precision."""
    rows = wl_entity_match(spark, SF_SMALL).collect()
    cust = {
        r["c_custkey"]: r["c_name"]
        for r in load_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_custkey") < 5000)
        .collect()
    }
    dirty_ids = [k for k in cust if k < 2000]
    assert {r["dirty_id"] for r in rows} == set(dirty_ids)
    for r in rows:
        assert r["dist"] <= 1
        assert _lev(r["dirty_name"], cust[r["matched_id"]]) == r["dist"]


def test_concurrency_half_open_convention(spark):
    """Peak concurrency can never exceed the number of intervals of
    its type, and an interval's close must not overlap a same-instant
    open (delta ASC orders -1 before +1), so the running sum never
    goes negative and never exceeds the open-interval census."""
    peaks = {
        r["event_type"]: r["peak_concurrency"]
        for r in ts_concurrency(spark, SF_SMALL).collect()
    }
    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for et, peak in peaks.items():
        assert 1 <= peak <= counts[et]
