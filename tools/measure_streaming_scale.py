"""Run the full streaming suite one decade above its usual bench
scale (VERDICT r7 #8): sf0.1 instead of sf0.01, RocksDB state store,
recording per-query wall clock, per-batch latency, and state-store
size (rows + bytes) from the StreamingQuery progress events the
harness now captures.

Prints one JSON line per streaming query plus a summary line for
BASELINE.md.

Usage: python tools/measure_streaming_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pg_telemetry_spark.registry import all_queries  # noqa: E402
from pg_telemetry_spark.session import get_session  # noqa: E402
from pg_telemetry_spark.streaming.harness import FileStreamHarness  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("measure-streaming-scale")
    registry = all_queries()
    names = sorted(n for n, q in registry.items() if q.group == "streaming")

    totals = {"wall_sec": 0.0, "max_state_rows": 0, "max_state_bytes": 0}
    batch_ms_all: list[int] = []
    for name in names:
        FileStreamHarness.progress_log.clear()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        wall = round(time.perf_counter() - t0, 3)
        batches = [
            b for run in FileStreamHarness.progress_log for b in run["batches"]
        ]
        durs = [b["duration_ms"] for b in batches if b.get("duration_ms")]
        state_rows = max((b["state_rows"] for b in batches), default=0)
        state_bytes = max((b["state_bytes"] for b in batches), default=0)
        totals["wall_sec"] += wall
        totals["max_state_rows"] = max(totals["max_state_rows"], state_rows)
        totals["max_state_bytes"] = max(totals["max_state_bytes"], state_bytes)
        batch_ms_all.extend(durs)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "wall_sec": wall,
                    "n_batches": len(batches),
                    "batch_ms": {
                        "min": min(durs, default=None),
                        "max": max(durs, default=None),
                        "mean": round(sum(durs) / len(durs), 1) if durs else None,
                    },
                    "max_state_rows": state_rows,
                    "max_state_bytes": state_bytes,
                }
            )
        )
    batch_ms_all.sort()
    print(
        json.dumps(
            {
                "metric": "streaming_scale_summary",
                "sf_dir": sf_dir,
                "n_queries": len(names),
                "wall_sec": round(totals["wall_sec"], 1),
                "batch_ms_p50": batch_ms_all[len(batch_ms_all) // 2]
                if batch_ms_all
                else None,
                "batch_ms_max": batch_ms_all[-1] if batch_ms_all else None,
                "max_state_rows": totals["max_state_rows"],
                "max_state_bytes": totals["max_state_bytes"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
