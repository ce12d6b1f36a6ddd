"""Guards for the driver-facing bench artifact contract.

Round 7's BENCH_r07.json came back ``parsed: null`` because bench's
single JSON line outgrew the driver's ~2 KB combined-output tail
capture.  bench.py now prints a compact headline-only line LAST;
these tests pin that the compact line stays inside the window even at
worst-case timing widths, without running Spark.
"""

from __future__ import annotations

import json

import bench


def _compact_line(value: float) -> str:
    compact = {
        "metric": "headline_suite_wall_clock",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: value for n in bench.HEADLINE},
        "sf": 0.1,
        "mode": "collect",
        "full": "BENCH_FULL.json",
        "streaming_total_sec": 999.999,
    }
    return json.dumps(compact, separators=(",", ":"))


def test_compact_line_fits_after_shedding_at_realistic_widths():
    # At 87 names even realistic 2-digit-second widths exceed the
    # 1900-char guard, so the shed loop is the NORMAL path now: it
    # must converge below the window while keeping the vast majority
    # of queries visible (only the fastest handful shed).
    timings = {n: 12.0 for n in bench.HEADLINE}
    compact = json.loads(_compact_line(12))
    line = json.dumps(compact, separators=(",", ":"))
    by_speed = sorted(timings, key=lambda n: (timings[n], n), reverse=True)
    while len(line) > 1900 and by_speed:
        by_speed.pop()
        compact["queries"] = {n: int(timings[n]) for n in by_speed}
        compact["queries_omitted"] = len(timings) - len(by_speed)
        line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900
    parsed = json.loads(line)
    # The 1900-char window holds ~80 two-digit entries no matter how
    # large HEADLINE grows (the full map always lands in
    # BENCH_FULL.json), so the invariant is the window's CAPACITY
    # floor — the slowest ~64+ queries stay individually visible —
    # not a proportion of an ever-growing headline list.
    assert len(parsed["queries"]) >= min(len(bench.HEADLINE), 64)


def test_compact_line_degrades_by_shedding_fastest_queries():
    # Past the 1900-char guard bench sheds the FASTEST queries first,
    # keeping per-query visibility for the slow ones.  Simulate the
    # shed loop at pathological widths and pin it converges inside
    # the window with the slowest entries retained.
    timings = {n: 9999.0 for n in bench.HEADLINE}
    slow = sorted(timings)[0]
    timings[slow] = 99999.0  # strictly the slowest -> must survive
    compact = json.loads(_compact_line(9999))
    line = json.dumps(compact, separators=(",", ":"))
    by_speed = sorted(timings, key=lambda n: (timings[n], n), reverse=True)
    while len(line) > 1900 and by_speed:
        by_speed.pop()
        compact["queries"] = {n: int(timings[n]) for n in by_speed}
        compact["queries_omitted"] = len(timings) - len(by_speed)
        line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900
    parsed = json.loads(line)
    assert slow in parsed["queries"]
    assert parsed["queries_omitted"] + len(parsed["queries"]) == len(timings)


def test_compact_line_is_parseable_json_with_contract_keys():
    parsed = json.loads(_compact_line(1.23))
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert len(parsed["queries"]) == len(bench.HEADLINE)


def test_dominance_flags():
    # VERDICT r8 #6: flag any query >15% of its leg's wall — the
    # absolute-dominance check that the 12x ratio bar missed for
    # llm_winnowing (x7.6 ratio but 62% of the sf1 leg)
    flags = bench._dominance_flags({"a": 62.0, "b": 20.0, "c": 18.0})
    assert [f["query"] for f in flags] == ["a", "b", "c"]
    assert flags[0]["share"] == 0.62
    assert bench._dominance_flags({"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0,
                                   "e": 1.0, "f": 1.0, "g": 1.0}) == []
    assert bench._dominance_flags({}) == []
    assert bench._dominance_flags({"a": 0.0}) == []


def test_suite_fault_isolation(spark):
    """A query that throws mid-suite costs its own row (recorded in
    bench._FAILURES), never the leg: round 9's first sf10 run died
    ~120 queries in and produced NO artifact at all."""
    from types import SimpleNamespace

    def ok(s, sf):
        return s.range(3)

    def boom(s, sf):
        raise RuntimeError("synthetic mid-leg failure")

    registry = {
        "q_ok": SimpleNamespace(fn=ok),
        "q_boom": SimpleNamespace(fn=boom),
        "q_ok2": SimpleNamespace(fn=ok),
    }
    bench._FAILURES.clear()
    spark2, timings = bench._run_suite(
        spark, registry, ["q_ok", "q_boom", "q_ok2"], "/tmp", "noop"
    )
    assert spark2 is spark  # context survived, no revival needed
    assert set(timings) == {"q_ok", "q_boom", "q_ok2"}
    assert list(bench._FAILURES) == ["/tmp:q_boom"]
    assert "RuntimeError" in bench._FAILURES["/tmp:q_boom"]
    bench._FAILURES.clear()
