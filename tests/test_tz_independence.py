"""Driver-timezone independence of the events time-slice bounds.

ADVICE r5 (high): the native-unit branch of ``load_events_sliced``
built bounds with ``F.lit(naive datetime)``, which classic PySpark
serializes through the driver OS timezone — on a non-UTC host a
'2024-01-02' bound silently became 05:00 UTC, shifting every slice by
the UTC offset.  The fix casts the wall-clock STRING to
``timestamp_ntz`` instead.  This test pins the fix at the process
level: a subprocess with TZ=America/New_York must slice exactly the
same rows as this (UTC) session.  Subprocess because the JVM captures
the OS timezone at startup — an in-process ``os.environ`` change
would not exercise the bug.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from pg_telemetry_spark.session import get_session
from pg_telemetry_spark.tables import load_events_sliced
import pyspark.sql.functions as F

spark = get_session("tz-independence-child")
df = load_events_sliced(spark, {sf!r}, "2024-01-02", "2024-01-03")
row = df.agg(
    F.count("*").alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
).head()
print("RESULT", row["n"], row["lo"].isoformat(), row["hi"].isoformat())
spark.stop()
"""


def _run_sliced_in_tz(sf_dir: str, tz: str) -> str:
    env = dict(os.environ, TZ=tz, SPARK_GRAFT_CPUS="4")
    # the JVM inherits TZ via user.timezone resolution at startup
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO), sf=sf_dir)],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stdout[-2000:]
    return lines[-1]


def test_slice_bounds_identical_under_nonutc_driver():
    sf_dir = "/root/testdata/sf0.001"
    utc = _run_sliced_in_tz(sf_dir, "UTC")
    nyc = _run_sliced_in_tz(sf_dir, "America/New_York")
    assert utc == nyc, f"slice shifted with driver TZ: UTC={utc} NYC={nyc}"
    n = int(utc.split()[1])
    assert n > 0, "slice must be non-empty for the comparison to mean anything"
