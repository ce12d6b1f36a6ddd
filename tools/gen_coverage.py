"""Generate COVERAGE.md: SURVEY §2 operator id -> implementation map,
straight from the live registry (so it cannot drift from the code)."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pg_telemetry_spark.registry import all_queries  # noqa: E402


def main() -> None:
    queries = all_queries()
    lines = [
        "# COVERAGE — SURVEY §2 operator inventory → implementation",
        "",
        "Auto-generated from `pg_telemetry_spark.registry` by",
        "`tools/gen_coverage.py`; every row is a registered key in",
        "`__spark_entry__.queries()`.  Tier A/B rows carry DuckDB oracle",
        "SQL (hash-matched by the driver's t2 gate); tier C rows are",
        "rows-only by design (approx/streaming/index-structure) and carry",
        "unit-test goldens instead — see the test file named per group.",
        "",
        "| query id | group | tier | oracle | implementation |",
        "| --- | --- | --- | --- | --- |",
    ]
    for name, q in sorted(queries.items(), key=lambda kv: (kv[1].group, kv[0])):
        mod = q.fn.__module__.replace("pg_telemetry_spark.", "")
        lines.append(
            f"| {name} | {q.group} | {q.tier} | "
            f"{'yes' if q.oracle else 'rows-only'} | `{mod}.{q.fn.__name__}` |"
        )
    tiers = Counter(q.tier for q in queries.values())
    lines += [
        "",
        f"**Totals: {len(queries)} operators — "
        f"{tiers.get('A', 0)} tier A, {tiers.get('B', 0)} tier B, "
        f"{tiers.get('C', 0)} tier C.**",
        "",
    ]
    (REPO / "COVERAGE.md").write_text("\n".join(lines))
    print(f"wrote COVERAGE.md: {len(queries)} operators, tiers {dict(tiers)}")


if __name__ == "__main__":
    main()
