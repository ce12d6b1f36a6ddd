"""Interleaved width sweep for the streaming harness state-store
partitioning (optimization r17, VERDICT r16 #3).

Runs every group="streaming" query at alternating
PG_TELEMETRY_SPARK_STREAM_SHUFFLE widths inside ONE bench-shaped
session (the only trustworthy seconds on this box — see the r16 noise
adjudication), reporting per-op and total seconds per width.

  python tools/sweep_stream_width.py 8 4 2   # widths, interleave reps
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIDTHS = [int(w) for w in sys.argv[1:]] or [8, 4]
REPS = int(os.environ.get("SWEEP_REPS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pg_telemetry_spark.session import get_session
    from pg_telemetry_spark.registry import all_queries

    spark = get_session("stream-width-sweep")
    registry = all_queries()
    ops = sorted(n for n, q in registry.items() if q.group == "streaming")

    # untimed warmup: first-ever streaming op pays engine/provider
    # class loading (same protocol as bench.py)
    os.environ["PG_TELEMETRY_SPARK_STREAM_SHUFFLE"] = str(WIDTHS[0])
    registry[ops[0]].fn(spark, SF_DIR).collect()

    totals: dict[int, list[float]] = {w: [] for w in WIDTHS}
    per_op: dict[tuple[str, int], list[float]] = {}
    for rep in range(REPS):
        for w in WIDTHS:
            os.environ["PG_TELEMETRY_SPARK_STREAM_SHUFFLE"] = str(w)
            t_total = 0.0
            for name in ops:
                t0 = time.monotonic()
                registry[name].fn(spark, SF_DIR).collect()
                dt = time.monotonic() - t0
                per_op.setdefault((name, w), []).append(dt)
                t_total += dt
            totals[w].append(t_total)
            print(f"rep {rep} width {w}: total {t_total:.2f}s", flush=True)

    print("\nper-op min seconds by width:")
    for name in ops:
        row = "  ".join(
            f"w{w}={min(per_op[(name, w)]):.2f}" for w in WIDTHS
        )
        print(f"  {name:28s} {row}")
    print("\ntotals (all reps):")
    for w in WIDTHS:
        print(f"  width {w}: {['%.2f' % t for t in totals[w]]}")


if __name__ == "__main__":
    main()
