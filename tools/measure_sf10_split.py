"""Replay ONLY the sf10 curve leg with the r15 split-session protocol
and report the watch-listed rows — the 'show the row return to band'
half of the BASELINE.md escalation rule (VERDICT r14 ask #5:
llm_semdedup read 63.0 s in-suite r14 and 34.7 s r15 against a
10.0-13.3 s solo steady band; the rule fired twice, so the sf10 leg
now runs as two ~75-query JVM sessions — bench.py _scale_curve).

Reuses bench.py's own leg machinery (_run_suite, _fresh, HEADLINE)
so the measurement is the shipped protocol, not a reimplementation.

Usage: python tools/measure_sf10_split.py
Writes SF10_SPLIT.json; paste the row into BASELINE.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pg_telemetry_spark.registry import all_queries  # noqa: E402
from pg_telemetry_spark.session import get_session  # noqa: E402

WATCH = [
    "llm_semdedup",
    "llm_dedup_near",
    "llm_dedup_incr",
    "llm_simhash",
    "llm_ann_lsh",
    "llm_ann_incr",
]


def main() -> None:
    sf10 = str(Path(bench.REPO) / "scaledata" / "sf10")
    registry = all_queries()
    names = [n for n in bench.HEADLINE if n in registry]
    spark = get_session("sf10-split")
    half = len(names) // 2
    spark, a = bench._run_suite(spark, registry, names[:half], sf10, "noop", gc_between=True)
    spark = bench._fresh(spark)
    spark, b = bench._run_suite(spark, registry, names[half:], sf10, "noop", gc_between=True)
    a.update(b)
    out = {
        "metric": "sf10_split_leg",
        "n_queries": len(a),
        "total_sec": round(sum(a.values()), 3),
        "watch": {n: a.get(n) for n in WATCH},
        "failures": dict(bench._FAILURES),
    }
    print(json.dumps(out))
    with open("/root/repo/SF10_SPLIT.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /root/repo/SF10_SPLIT.json")
    spark.stop()


if __name__ == "__main__":
    main()
