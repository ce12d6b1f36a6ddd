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


def test_compact_line_fits_driver_tail_window():
    # Worst realistic width: every query at a 3-digit-second timing
    # (the whole 78-query suite runs ~80 s at sf0.1 — a single query
    # at 999 s is already a 100x regression).  bench emits INTEGER
    # seconds per query; the driver keeps ~2000 chars and bench
    # guards at 1900, degrading to an omitted-queries stub past that.
    line = _compact_line(999)
    assert len(line) < 1900, (
        f"compact bench line is {len(line)} chars; it will be "
        "front-truncated out of the driver's tail capture — trim the "
        "HEADLINE list or tighten the compact encoding"
    )


def test_compact_line_degrades_to_parseable_stub_past_guard():
    # Pathological widths (4-digit seconds x 78 names) exceed 1900;
    # bench then replaces the per-query dict with a count stub.  Pin
    # that the stubbed line parses and stays inside the window.
    line = _compact_line(9999)
    if len(line) > 1900:
        parsed = json.loads(line)
        parsed["queries"] = {"omitted_see_full": len(parsed["queries"])}
        stub = json.dumps(parsed, separators=(",", ":"))
        assert len(stub) < 1900
        assert json.loads(stub)["value"] == 9999.999


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
